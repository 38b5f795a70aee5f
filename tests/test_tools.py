"""Offline tools: dbconvert, label_extraction, mask_creator, plotting."""

import os
import os.path as osp
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from synth_data import make_seg_tree  # noqa: E402


def test_dbconvert(tmp_path):
    root = str(tmp_path)
    make_seg_tree(root, n_train=8, n_val=8, size=(64, 80), cameras=False)
    from robocupvision_tpu.tools import dbconvert

    rc = dbconvert.main(["--root", root, "--splits", "val"])
    assert rc == 0
    data_dir = osp.join(root, "val")
    b = np.load(osp.join(data_dir, "bMean.npy"))
    assert b.shape == (4,)
    r = np.load(osp.join(data_dir, "rMean.npy"))
    assert r.shape[1] == 4
    with open(osp.join(data_dir, "preds.pickle"), "rb") as f:
        preds = pickle.load(f)
    assert len(preds) == 8
    # each entry: [filename, [cls, box], ...]
    assert isinstance(preds[0][0], str)
    for item in preds[0][1:]:
        assert item[0] in (1, 2, 3) and item[1].shape == (4,)


def test_detect_objects_caps_and_area_filters():
    from robocupvision_tpu.tools.dbconvert import detect_objects

    lab = np.zeros((60, 80), np.uint8)
    # two balls, one tiny (below min area 25)
    lab[5:15, 5:15] = 1          # 100 px
    lab[30:33, 30:33] = 1        # 9 px -> filtered
    # one robot big enough
    lab[40:58, 10:40] = 2        # 540 px
    dets = detect_objects(lab)
    classes = [d[0] for d in dets]
    assert classes.count(1) == 1
    assert classes.count(2) == 1


def test_label_extraction(tmp_path):
    mask_dir = str(tmp_path / "masks") + "/"
    os.makedirs(mask_dir)
    h, w = 6, 8
    # legend: ids 1-2 -> Ball, 3-4 -> Robot ; LabelConfig: Ball->1 Robot->2
    with open(osp.join(mask_dir, "legend.leg"), "w") as f:
        f.write("2:Ball 2:Robot\n")
    with open(osp.join(mask_dir, "LabelConfig.cfg"), "w") as f:
        f.write("Ball:1\nRobot:2\n")
    grid = np.zeros((h, w), np.int64)
    grid[0, 0] = 1  # Ball
    grid[1, 1] = 2  # Ball (still id <= 2)
    grid[2, 2] = 3  # Robot
    with open(osp.join(mask_dir, "m0.txt"), "w") as f:
        for row in grid:
            f.write(" ".join(str(v) for v in row) + "\n")

    from robocupvision_tpu.tools import label_extraction

    out_dir = str(tmp_path / "out")
    n = label_extraction.extract(mask_dir, out_dir, height=h, width=w)
    assert n == 1
    lab = np.asarray(Image.open(osp.join(out_dir, "m0.png")))
    assert lab[0, 0] == 1 and lab[1, 1] == 1 and lab[2, 2] == 2
    assert lab.sum() == 4


def test_majority_filter_denoises_salt():
    from robocupvision_tpu.tools.label_extraction import majority_filter

    lab = np.zeros((20, 20), np.uint8)
    lab[10, 10] = 3  # single salt pixel
    out = majority_filter(lab)
    assert out[10, 10] == 0


def test_mask_creator(tmp_path):
    img_dir = str(tmp_path / "imgs")
    lab_dir = str(tmp_path / "labs")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    for i in range(3):
        Image.fromarray(np.full((40, 50, 3), 100, np.uint8)).save(
            osp.join(img_dir, f"{i}.png"))
        Image.fromarray(np.full((40, 50), 2, np.uint8)).save(
            osp.join(lab_dir, f"{i}.png"))
    from robocupvision_tpu.tools import mask_creator

    n = mask_creator.process(img_dir, lab_dir, (20, 24))
    assert n == 3
    img = Image.open(osp.join(img_dir, "0.png"))
    assert img.size == (24, 20)
    lab = np.asarray(Image.open(osp.join(lab_dir, "0.png")))
    assert lab.shape == (20, 24) and (lab == 2).all()


def test_line_plotter(tmp_path):
    from robocupvision_tpu.utils.plotting import LinePlotter

    pl = LinePlotter("test", out_dir=str(tmp_path))
    for e in range(5):
        pl.plot("loss", "train", e, 1.0 / (e + 1))
        pl.plot("loss", "val", e, 1.2 / (e + 1))
    tsv = osp.join(str(tmp_path), "test_loss.tsv")
    assert osp.exists(tsv)
    lines = open(tsv).read().strip().split("\n")
    assert len(lines) == 11  # header + 10 points
    pngs = pl.render()
    assert pngs and osp.exists(pngs[0])


def test_line_plotter_live_server(tmp_path):
    """The serve() live view (Visdom analog, reference visualize.py:4-21)
    renders the current series as SVG over HTTP."""
    import urllib.request

    from robocupvision_tpu.utils.plotting import LinePlotter

    pl = LinePlotter("live", out_dir=str(tmp_path))
    srv = pl.serve(port=0)
    try:
        port = srv.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "no data yet" in page
        for e in range(4):
            pl.plot("loss", "train", e, 1.0 / (e + 1))
            pl.plot("loss", "val", e, 1.5 / (e + 1))
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "<svg" in page and page.count("<polyline") == 2
        assert "train" in page and "val" in page
    finally:
        srv.shutdown()
