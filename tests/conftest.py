"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).
"""

import os

os.environ.pop("JAX_PLATFORMS", None)  # the axon TPU plugin re-appends itself
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden by the plugin

# Persistent compilation cache: the suite compiles many tiny programs on a
# 1-core host; caching across runs cuts wall clock substantially.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Stub skimage (absent from this image) so the *reference* code at
# /root/reference can be imported for cross-implementation parity tests.
import sys  # noqa: E402
import types  # noqa: E402

if "skimage" not in sys.modules:
    import numpy as _np

    _YUV = _np.array([[0.299, 0.587, 0.114],
                      [-0.14714119, -0.28886916, 0.43601035],
                      [0.61497538, -0.51496512, -0.10001026]])

    def _rgb2yuv(img):
        arr = _np.asarray(img, dtype=_np.float64) / 255.0 \
            if _np.asarray(img).dtype == _np.uint8 else _np.asarray(img, dtype=_np.float64)
        return arr @ _YUV.T

    _sk = types.ModuleType("skimage")
    _skc = types.ModuleType("skimage.color")
    _skc.rgb2yuv = _rgb2yuv
    _sk.color = _skc
    sys.modules["skimage"] = _sk
    sys.modules["skimage.color"] = _skc

if "progressbar" not in sys.modules:
    _pb = types.ModuleType("progressbar")

    class _Bar:
        def __init__(self, *a, **k):
            pass

        def update(self, *a):
            pass

        def finish(self):
            pass

    _pb.ProgressBar = _Bar
    sys.modules["progressbar"] = _pb

if "visdom" not in sys.modules:
    _vd = types.ModuleType("visdom")

    class _Visdom:
        def __init__(self, *a, **k):
            pass

        def line(self, *a, **k):
            return None

    _vd.Visdom = _Visdom
    sys.modules["visdom"] = _vd

if "torchvision" not in sys.modules:
    # Minimal stub: reference dataset.py imports these at module level but the
    # parity tests only use classes that don't touch them.
    _tv = types.ModuleType("torchvision")
    _tvt = types.ModuleType("torchvision.transforms")
    _tvf = types.ModuleType("torchvision.transforms.functional")
    _tvd = types.ModuleType("torchvision.datasets")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: not available in tests")

    for _name in ["Resize", "Normalize", "Compose", "ToTensor", "ColorJitter",
                  "RandomHorizontalFlip"]:
        setattr(_tvt, _name, type(_name, (_Unavailable,), {}))
    _tvt.functional = _tvf
    _tv.transforms = _tvt
    _tv.datasets = _tvd
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tvt
    sys.modules["torchvision.transforms.functional"] = _tvf
    sys.modules["torchvision.datasets"] = _tvd
