"""--neighbor_limits/--band_caps CLI overrides (cli/common.py): the
`preprocess calibrate` output must be directly usable on the train/eval
CLIs without editing PyramidConfig."""

import argparse

from rdmnet_tpu.cli.common import add_pyramid_overrides, apply_pyramid_overrides
from rdmnet_tpu.config import make_cfg


def _parse(argv):
    p = argparse.ArgumentParser()
    add_pyramid_overrides(p)
    return p.parse_args(argv)


def test_defaults_are_untouched():
    cfg = make_cfg()
    out = apply_pyramid_overrides(cfg, _parse([]))
    assert out.pyramid is cfg.pyramid


def test_overrides_apply_and_scale():
    cfg = make_cfg()
    args = _parse(["--neighbor_limits", "65,63,69,71,81",
                   "--band_caps", "8192,4096,none,none,none"])
    out = apply_pyramid_overrides(cfg, args)
    assert out.pyramid.neighbor_limits == (65, 63, 69, 71, 81)
    assert out.pyramid.band_caps == (8192, 4096, None, None, None)
    # measured band caps survive bucket scaling verbatim (band occupancy
    # depends on the data, not the bucket, whenever clouds fit)
    scaled = out.pyramid.scaled(0.5)
    assert scaled.band_caps == (8192, 4096, None, None, None)
    assert scaled.caps[0] < out.pyramid.caps[0]
    # default (uncalibrated) band caps still scale with the bucket
    dflt = make_cfg().pyramid
    assert dflt.scaled(0.5).band_caps[0] < dflt.band_caps[0]


def test_enable_compile_cache_env(monkeypatch, tmp_path):
    """CLI compile-cache helper: env override, off switch, no clobbering.

    The conftest already configures a cache dir for the suite, so the
    no-clobber branch is the one every CLI-under-test actually exercises;
    the override/off branches are checked by temporarily unsetting it."""
    import jax

    from rdmnet_tpu.cli.common import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # pre-set value (the conftest's) is never clobbered
        monkeypatch.setenv("RDMNET_COMPILE_CACHE", str(tmp_path / "cc"))
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        # env override wins when nothing is configured
        jax.config.update("jax_compilation_cache_dir", None)
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()

        # off switch leaves the cache unconfigured
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("RDMNET_COMPILE_CACHE", "off")
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
