from .engine import TrainConfig, make_fold_runner, train  # noqa: F401
from .kfold import FOLD_SEEDS, all_round_masks, fold_node_masks  # noqa: F401
from .losses import multi_loss, weight_cal  # noqa: F401
from .metrics import (  # noqa: F401
    aim_cov_acc, macro_auc, macro_f1, micro_auc, micro_f1)
from .postprocess import (  # noqa: F401
    protein_loc_correction,
    protein_loc_correction_np,
    scaling_np,
)
