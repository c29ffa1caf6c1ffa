from rdmnet_tpu.data.datasets import (  # noqa: F401
    RegistrationPairDataset,
    make_dataset,
)
from rdmnet_tpu.data.loader import PairLoader  # noqa: F401
