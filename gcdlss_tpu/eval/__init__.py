from .metrics import (
    confusion_update,
    get_iou,
    hungarian,
    strict_hungarian_iou,
    discovery_iou,
    SemanticEval,
)
from .sweep import threshold_sweep_test, DEFAULT_THRESHOLDS
