from .misc import AverageMeter, cluster_acc, entropy, margin_loss, TransformTwice
from .visualize import get_color, write_ply, read_ply
