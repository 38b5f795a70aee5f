"""End-to-end CLI tests for test.py / tester.py / detect.py equivalents."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(__file__))
from synth_data import make_dataset_root  # noqa: E402


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Synthetic dataset + a quickly-trained checkpoint in a workdir."""
    root = str(tmp_path_factory.mktemp("robocup"))
    make_dataset_root(root, size=(48, 64))
    work = str(tmp_path_factory.mktemp("work"))
    cwd = os.getcwd()
    os.chdir(work)
    try:
        from robocupvision_tpu.cli import train as cli_train

        # --labSize keeps training at the synthetic frames' native 48x64
        # (the default would upscale to QVGA: ~6x the compute for the same
        # fully-convolutional checkpoint — this fixture cost 190+ s of the
        # quick tier before)
        rc = cli_train.main(["--root", root, "--epochs", "2",
                             "--batchSize", "8", "--labSize", "48", "64"])
        assert rc == 0
    finally:
        os.chdir(cwd)
    return {"root": root, "work": work}


def test_test_cli(env, monkeypatch, capsys):
    monkeypatch.chdir(env["work"])
    from robocupvision_tpu.cli import test as cli_test

    rc = cli_test.main(["--root", env["root"], "--batchSize", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Testing checkpoints/best.weights" in out
    assert "Mean IoU" in out
    assert "IoU: [" in out and "Dist: [" in out


def test_tester_cli(env, monkeypatch, capsys):
    """tester.py path: craft the legacy pth checkpoint, run inference+dump."""
    monkeypatch.chdir(env["work"])
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import checkpoint

    # --noScale => scale 1: the 48x64 synthetic frames divide cleanly through
    # the 4-level stride pyramid (at scale 4 they would not — the reference
    # has the same divisibility constraint).
    m = zoo.make("pb_fcn", planes=32, num_classes=5, kernel_size=1,
                 no_scale=True)
    params = {k: np.asarray(v) for k, v in m.init(jax.random.PRNGKey(0)).items()}
    checkpoint.save("pth/bestModelSegVGA.pth", m.registry, params)

    from robocupvision_tpu.cli import tester as cli_tester

    rc = cli_tester.main(["--root", env["root"], "--dump", "--aot",
                          "--noScale"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Mean IoU" in out
    assert osp.exists("weights/VGA/weights2.dat")
    assert osp.exists("weights/VGA/net.cfg")
    assert osp.exists("output/0.png")

    # the AOT artifact (export/aot.py) reloads standalone and labels a
    # frame identically to the live packed graph
    from robocupvision_tpu.export import aot
    from robocupvision_tpu.models import packed as pk

    assert osp.exists("weights/VGA/serving.stablehlo")
    fn = aot.load_serving("weights/VGA")
    from robocupvision_tpu.data.datasets import SSDataSet

    ds = SSDataSet(env["root"], split="val", scale=1)
    x = np.asarray(ds[0][0])[None]
    params = checkpoint.load_any("pth/bestModelSegVGA.pth", m.registry)
    import jax.numpy as jnp

    live = pk.build_packed_pb_fcn(m, params, jnp.float32).infer_u8
    np.testing.assert_array_equal(np.asarray(fn(x)),
                                  np.asarray(jax.jit(live)(x)))


def test_tester_cli_packed_matches_standard(env, monkeypatch, capsys):
    """tester.py --packed (PB_FCN packed graph, f32) prints identical
    metrics and masks to the standard graph. Runs after test_tester_cli
    (reuses its pth checkpoint)."""
    monkeypatch.chdir(env["work"])
    if not osp.exists("pth/bestModelSegVGA.pth"):
        pytest.skip("tester checkpoint not present")
    from PIL import Image

    from robocupvision_tpu.cli import tester as cli_tester

    rc = cli_tester.main(["--root", env["root"], "--noScale"])
    assert rc == 0
    out_plain = capsys.readouterr().out
    mask_plain = np.asarray(Image.open("output/0.png"))

    rc = cli_tester.main(["--root", env["root"], "--noScale", "--packed"])
    assert rc == 0
    out_packed = capsys.readouterr().out

    def metrics(s):
        return [l for l in s.splitlines() if l.startswith("Validation")]

    assert metrics(out_packed) == metrics(out_plain)
    np.testing.assert_array_equal(np.asarray(Image.open("output/0.png")),
                                  mask_plain)

    # --pallas (fused chain kernels; interpret mode on CPU): identical
    # metrics, near-identical masks (float reassociation may flip argmax
    # ties — the per-pixel tolerance is pinned by test_pallas_packed)
    rc = cli_tester.main(["--root", env["root"], "--noScale", "--packed",
                          "--pallas"])
    assert rc == 0
    out_pallas = capsys.readouterr().out
    import re

    def nums(s):
        return [float(v) for l in metrics(s)
                for v in re.findall(r"[\d.]+", l)]

    np.testing.assert_allclose(nums(out_pallas), nums(out_plain), atol=1e-3)
    mask_pallas = np.asarray(Image.open("output/0.png"))
    assert np.mean(mask_pallas != mask_plain) < 1e-4


def test_tester_cli_pipelined_matches_serial(env, monkeypatch, capsys):
    """tester.py --pipeline N (software-pipelined serving, utils/serving.py)
    must print identical metrics and write identical masks to the serial
    loop — pipelining only reorders work. Reuses test_tester_cli's pth."""
    monkeypatch.chdir(env["work"])
    if not osp.exists("pth/bestModelSegVGA.pth"):
        pytest.skip("tester checkpoint not present")
    from PIL import Image

    from robocupvision_tpu.cli import tester as cli_tester

    rc = cli_tester.main(["--root", env["root"], "--noScale"])
    assert rc == 0
    out_serial = capsys.readouterr().out
    masks = [np.asarray(Image.open(f"output/{i}.png")) for i in range(2)]

    rc = cli_tester.main(["--root", env["root"], "--noScale",
                          "--pipeline", "3"])
    assert rc == 0
    out_piped = capsys.readouterr().out
    assert "Pipelined serving (depth 3)" in out_piped

    def metrics(s):
        return [l for l in s.splitlines() if l.startswith("Validation")]

    assert metrics(out_piped) == metrics(out_serial)
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(Image.open(f"output/{i}.png")), masks[i])


def test_detect_cli(env, monkeypatch, capsys):
    monkeypatch.chdir(env["work"])
    from robocupvision_tpu.cli import detect as cli_detect

    rc = cli_detect.main(["--root", env["root"]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Detection" in out
    assert osp.exists("output/0.png")

    # --packed must produce byte-identical masks (exact graph rewrite)
    import numpy as np
    from PIL import Image

    plain = np.asarray(Image.open("output/0.png"))
    rc = cli_detect.main(["--root", env["root"], "--packed"])
    assert rc == 0
    np.testing.assert_array_equal(np.asarray(Image.open("output/0.png")), plain)
