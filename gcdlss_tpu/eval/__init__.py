from .metrics import (
    confusion_update,
    get_iou,
    hungarian,
    strict_hungarian_iou,
    discovery_iou,
    SemanticEval,
)
