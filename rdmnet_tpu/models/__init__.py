from rdmnet_tpu.models.rdmnet import RDMNet  # noqa: F401
