from rdmnet_tpu.models.rdmnet import RDMNet  # noqa: F401


def create_model(cfg):
    """Reference-API parity alias (experiments/model.py:399 create_model):
    returns the flagship model for ``cfg``. Flax modules are stateless —
    initialize with ``model.init(key, batch, training=..., with_gt=...)``."""
    return RDMNet(cfg)
