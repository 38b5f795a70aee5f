"""testDumper CLI: dumps replayable goldens; the native engine replays them."""

import os

import numpy as np

from robocupvision_tpu.export.engine import NativeEngine


def test_dumper_and_engine_replay(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from robocupvision_tpu.cli import testDumper

    rc = testDumper.main(["--out", "tests_golden"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "TrC" in out and "C13" in out

    data_c1 = np.fromfile("tests_golden/dataC1.npy", np.float32).reshape(4, 32, 32)
    data_f = np.fromfile("tests_golden/dataF.npy", np.float32).reshape(32, 1, 1)

    for name, _, (h, w, cin) in testDumper.CASES:
        cfg = f"tests_golden/{name}.cfg"
        wfile = f"tests_golden/{name}.npy"
        eng = NativeEngine(cfg, wfile)
        x = data_f if name == "FC" else data_c1
        got = eng.forward(x).reshape(-1)
        ref = np.fromfile(f"tests_golden/out{name}.npy", np.float32)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=name)
        eng.close()
