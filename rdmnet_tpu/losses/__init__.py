from rdmnet_tpu.losses.circle_loss import weighted_circle_loss  # noqa: F401
from rdmnet_tpu.losses.losses import (  # noqa: F401
    CoarseMatchingLoss,
    GapLoss,
    OverallLoss,
    OverlapLoss,
    SingleSideChamferLoss,
    VoteLoss,
)
from rdmnet_tpu.losses.evaluator import Evaluator, isotropic_transform_error  # noqa: F401
