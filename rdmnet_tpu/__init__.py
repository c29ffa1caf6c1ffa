"""rdmnet_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud registration framework.

Re-implements the full capability surface of RDMNet ("Reliable Dense-point
Matching Network", TITS 2023) as a from-scratch TPU-first design:

* every irregular geometry op (voxel-grid subsampling, radius neighbor
  search, point-to-node partition) is a fixed-capacity, statically-shaped,
  jittable op that runs **on device** — the reference computes these on CPU
  inside DataLoader workers (reference: geotransformer/utils/data.py:13-77);
* the model is a pure-functional flax module over masked padded arrays;
* pose estimation (weighted Procrustes / local-to-global registration) runs
  batched on the MXU with native TPU SVD (the reference round-trips to CPU,
  geotransformer/modules/registration/procrustes.py:53);
* scaling is expressed with jax.sharding.Mesh + shard_map collectives
  instead of NCCL DDP (reference: geotransformer/engine/base_trainer.py:63-78).
"""

__version__ = "0.1.0"

from rdmnet_tpu.config import make_cfg  # noqa: F401
