"""One-shot checkpoint conversion between the torch reference and this
framework — both directions.

Import (torch .pth.tar -> orbax snapshot) and export (orbax snapshot ->
torch .pth.tar, for taking a TPU-trained model BACK to the reference and
evaluating it with the original tooling):

    # export: --schema is any reference checkpoint providing the target
    # key/shape schema (e.g. a random-init state_dict saved from the
    # reference; regenerated buffers like div_term are synthesized)
    python -m rdmnet_tpu.cli.convert --snapshot_dir out/snapshots \
        --to_torch out/rdmnet_tpu.pth.tar --schema weights/rdmnet.pth.tar


The test/infer CLIs can load a reference checkpoint directly with
``--torch_checkpoint`` (conversion happens at every startup and requires
torch installed). This CLI converts ONCE into the framework's native
snapshot layout (engine/checkpoint.CheckpointManager), after which any
snapshot consumer works without torch:

    python -m rdmnet_tpu.cli.convert \
        --torch_checkpoint weights/rdmnet.pth.tar --output_dir out/converted
    python -m rdmnet_tpu.cli.test --snapshot_dir out/converted --parity_cfg ...

Converted weights are only meaningful under the reference-faithful parity
config (calibrated neighbor limits, exact search, per-layer kernel
dispositions — see config.make_parity_cfg and STATUS.md round-2 #11), so
the snapshot must be consumed with ``--parity_cfg``; this CLI stores that
requirement in the snapshot metadata as a reminder.

Reference checkpoint schema: engine/base_trainer.py:113-138 ('model' state
dict + epoch/iteration metadata, 'module.' prefixes under DDP).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def convert_checkpoint(cfg, torch_checkpoint: str, output_dir: str,
                       epoch=None, requires_parity_cfg: bool = True) -> int:
    """Convert ``torch_checkpoint`` and write an orbax snapshot into
    ``output_dir``; returns the snapshot step."""
    import torch

    from rdmnet_tpu.cli.common import build_model_and_params
    from rdmnet_tpu.engine.checkpoint import CheckpointManager
    from rdmnet_tpu.engine.train_step import TrainState, create_optimizer

    blob = torch.load(torch_checkpoint, map_location="cpu")
    if epoch is None:
        epoch = int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0

    # host-only conversion: no jitted eval follows, so skip the device
    # commit (it would upload ~90 MB to the remote TPU only for the orbax
    # save below to fetch it straight back)
    model, params = build_model_and_params(
        cfg, torch_checkpoint=torch_checkpoint, commit_to_device=False
    )
    # wrap in a TrainState (fresh optimizer state) so the standard
    # snapshot-restore path (cli/common.build_model_and_params) consumes it
    tx, _ = create_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mgr = CheckpointManager(output_dir)
    mgr.save(
        epoch,
        jax.device_get(state),
        metadata={
            "epoch": epoch,
            "source": torch_checkpoint,
            "requires_parity_cfg": requires_parity_cfg,
        },
    )
    mgr.wait_until_finished()
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(
        f"converted {torch_checkpoint} -> {output_dir} "
        f"(step {epoch}, {n_params / 1e6:.1f}M params); consume with "
        + ("--parity_cfg" if requires_parity_cfg else "the default config")
    )
    return epoch


def export_checkpoint(cfg, snapshot_dir: str, schema_path: str,
                      out_path: str, epoch=None) -> int:
    """Export an orbax snapshot's params into the reference's .pth.tar
    schema (key set + shapes taken from ``schema_path``); returns the
    exported epoch."""
    import torch

    from rdmnet_tpu.cli.common import build_model_and_params
    from rdmnet_tpu.utils.torch_convert import export_state_dict, load_torch_checkpoint

    # host-only export: torch consumes the tree leaf-by-leaf on the host,
    # so a device commit would turn it into per-leaf tunnel round trips
    _, params = build_model_and_params(cfg, snapshot_dir, epoch,
                                       commit_to_device=False)
    schema = {
        k: tuple(v.shape) for k, v in load_torch_checkpoint(schema_path).items()
    }
    sd = export_state_dict(params["params"], schema)
    if epoch is None:
        # label the blob with the snapshot actually restored (latest), not 0
        from rdmnet_tpu.engine.checkpoint import CheckpointManager

        epoch = CheckpointManager(snapshot_dir).latest_step()
    blob_epoch = epoch if epoch is not None else 0
    torch.save(
        {"model": {k: torch.from_numpy(np.array(v))  # copy: orbax arrays are read-only
                   for k, v in sd.items()},
         "epoch": blob_epoch},
        out_path,
    )
    print(f"exported {snapshot_dir} -> {out_path} ({len(sd)} tensors)")
    return blob_epoch


def main():
    # conversion is pure host work: key mapping + optimizer-state zeros +
    # an orbax write. Running it on the remote TPU pays per-op tunnel
    # dispatch for every eager tree op (minutes); force CPU before any
    # device use (the env var alone is ignored under the axon plugin).
    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_checkpoint", default=None,
                        help="import direction: reference .pth.tar to convert")
    parser.add_argument("--output_dir", default=None,
                        help="import direction: orbax snapshot destination")
    parser.add_argument("--snapshot_dir", default=None,
                        help="export direction: orbax snapshot to export")
    parser.add_argument("--to_torch", default=None,
                        help="export direction: .pth.tar destination")
    parser.add_argument("--schema", default=None,
                        help="export direction: reference checkpoint whose "
                             "key/shape schema the export targets")
    parser.add_argument(
        "--epoch", type=int, default=None,
        help="snapshot step label (default: the checkpoint's own epoch, or 0)",
    )
    parser.add_argument("--no_parity_cfg", action="store_true")
    args = parser.parse_args()

    from rdmnet_tpu.config import make_cfg, make_parity_cfg

    cfg = make_cfg() if args.no_parity_cfg else make_parity_cfg()
    if args.to_torch:
        if not (args.snapshot_dir and args.schema):
            parser.error("--to_torch requires --snapshot_dir and --schema")
        export_checkpoint(
            cfg, args.snapshot_dir, args.schema, args.to_torch, epoch=args.epoch
        )
    else:
        if not (args.torch_checkpoint and args.output_dir):
            parser.error("import requires --torch_checkpoint and --output_dir")
        convert_checkpoint(
            cfg, args.torch_checkpoint, args.output_dir,
            epoch=args.epoch, requires_parity_cfg=not args.no_parity_cfg,
        )


if __name__ == "__main__":
    main()
