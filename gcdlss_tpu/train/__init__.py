from .schedule import warmup_cosine_lr, make_lr_schedule
from .pretrain import PretrainConfig, ExpPretrain, create_pretrain_state, pretrain_train_step
