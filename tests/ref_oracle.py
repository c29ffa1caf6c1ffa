"""Test-only harness for using the torch reference at /root/reference as a
numeric oracle.

Compiles the reference's CPU C++ extension (grid_subsampling /
radius_neighbors) out-of-tree into a gitignored cache dir, stubs the
reference's unavailable third-party imports (open3d / ipdb / easydict), and
imports the reference packages. Nothing here ships in the framework — it
exists so parity tests can assert our flax modules compute the same function
as the reference's torch modules (reference setup.py:1-22 for the ext build;
the CUDA include in common/torch_helper.h:3 is stripped since the kernels are
CPU-only).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import types

import numpy as np

REF = "/root/reference"
CACHE = "/root/repo/.cache/refext"
EXT_SO = os.path.join(CACHE, "rdmnet", "ext.so")

_EXT_SOURCES = [
    "extra/cloud/cloud.cpp",
    "cpu/grid_subsampling/grid_subsampling.cpp",
    "cpu/grid_subsampling/grid_subsampling_cpu.cpp",
    "cpu/radius_neighbors/radius_neighbors.cpp",
    "cpu/radius_neighbors/radius_neighbors_cpu.cpp",
    "pybind.cpp",
]


def build_ext() -> str:
    """Compile the reference extension (cached); returns the ext.so path."""
    if os.path.exists(EXT_SO):
        return EXT_SO
    import torch.utils.cpp_extension as ce

    os.makedirs(os.path.join(CACHE, "rdmnet"), exist_ok=True)
    src = os.path.join(CACHE, "src")
    if os.path.exists(src):
        shutil.rmtree(src)
    shutil.copytree(os.path.join(REF, "geotransformer/extensions"), src)
    # the kernels are CPU-only; the CUDA include breaks on cpu-only torch
    helper = os.path.join(src, "common/torch_helper.h")
    with open(helper) as f:
        text = f.read()
    with open(helper, "w") as f:
        f.write(text.replace("#include <ATen/cuda/CUDAContext.h>", ""))

    inc = ce.include_paths()
    lib = ce.library_paths()[0]
    import sysconfig

    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17"]
        + [f"-I{p}" for p in inc]
        + [f"-I{sysconfig.get_paths()['include']}"]
        + [
            "-D_GLIBCXX_USE_CXX11_ABI=1",
            "-DTORCH_API_INCLUDE_EXTENSION_H",
            "-DTORCH_EXTENSION_NAME=ext",
        ]
        + [os.path.join(src, s) for s in _EXT_SOURCES]
        + [f"-L{lib}", f"-Wl,-rpath,{lib}",
           "-ltorch", "-ltorch_cpu", "-ltorch_python", "-lc10",
           "-o", EXT_SO]
    )
    subprocess.run(cmd, check=True, capture_output=True)
    return EXT_SO


def _read_ply_xyz(path: str) -> np.ndarray:
    """Minimal binary_little_endian PLY reader (float64 x/y/z vertices) —
    enough for the shipped kernel-disposition asset."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = None
        for line in header.decode().splitlines():
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
        assert n is not None, f"no vertex element in {path}"
        assert "binary_little_endian" in header.decode()
        data = np.fromfile(f, dtype="<f8", count=n * 3)
    return data.reshape(n, 3)


def _install_stubs() -> None:
    """Stub the reference's imports that are not in this image."""
    # legacy numpy aliases used by the reference (np.int at thdroformer.py:73)
    for alias, typ in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    # the reference hard-codes .cuda() (e.g. learnable_sinkhorn.py:38-47,
    # procrustes.py:54-57); on this CPU-only torch make it a no-op
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")

        class _PCD:
            def __init__(self, points=None):
                self.points = points

        o3d.geometry = types.SimpleNamespace(PointCloud=_PCD)
        o3d.utility = types.SimpleNamespace(Vector3dVector=np.asarray)
        o3d.io = types.SimpleNamespace(
            read_point_cloud=lambda p: _PCD(_read_ply_xyz(p)),
            write_point_cloud=lambda p, pcd: None,
        )
        sys.modules["open3d"] = o3d
    if "ipdb" not in sys.modules:
        ipdb = types.ModuleType("ipdb")
        ipdb.set_trace = lambda: None
        sys.modules["ipdb"] = ipdb
    if "utils" not in sys.modules:
        # rdmnet/utils/utils_common.py:15 imports `utils.logger`, a module
        # that exists nowhere in the reference tree (dead dependency from the
        # authors' environment); stub it so model-level imports resolve
        u = types.ModuleType("utils")
        ul = types.ModuleType("utils.logger")

        class _Logger:
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, name):
                return lambda *a, **k: None

        ul.Logger = _Logger
        u.logger = ul
        sys.modules["utils"] = u
        sys.modules["utils.logger"] = ul
    for missing in ("pykitti", "nibabel", "MinkowskiEngine"):
        # optional deps imported at module scope by rdmnet/utils/*;
        # unused by the model forward path
        if missing not in sys.modules:
            sys.modules[missing] = types.ModuleType(missing)
    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None, **kwargs):
                super().__init__()
                for k, v in {**(d or {}), **kwargs}.items():
                    setattr(self, k, v)

            def __setattr__(self, name, value):
                if isinstance(value, dict) and not isinstance(value, EasyDict):
                    value = EasyDict(value)
                super().__setitem__(name, value)
                object.__setattr__(self, name, value)

            __setitem__ = __setattr__

            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as e:
                    raise AttributeError(name) from e

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict


_loaded = False


def load_reference():
    """Import the reference packages with the compiled ext; idempotent.

    Returns the (geotransformer, rdmnet) package pair; raises on failure
    (callers pytest.skip on exception if they want to be lenient).
    """
    global _loaded
    import torch  # noqa: F401  (loads libtorch before the ext)

    _install_stubs()
    build_ext()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import rdmnet

    ext_dir = os.path.dirname(EXT_SO)
    if ext_dir not in rdmnet.__path__:
        rdmnet.__path__.append(ext_dir)
    import importlib

    importlib.import_module("rdmnet.ext")
    import geotransformer

    _loaded = True
    return geotransformer, rdmnet
