"""Synthetic tiny RoboCup-layout dataset generator for end-to-end tests.

Writes the reference's exact directory conventions (SURVEY.md §2.2): a
segmentation tree (train/val images+labels+camera sidecars), a
FinetuneHorizon copy, LabelProp sequence dirs, and a Classification
ImageFolder tree. Images are procedurally drawn so that the 5 classes are
learnable in a few epochs: ball = blue disc, robot = green box, goal = red
posts, line = white stripe, background = gradient.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
from PIL import Image


def _draw_scene(rng: np.random.Generator, h: int, w: int):
    img = np.zeros((h, w, 3), np.float32)
    img[..., 1] = np.linspace(0.2, 0.5, h)[:, None]  # greenish field gradient
    lab = np.zeros((h, w), np.uint8)

    yy, xx = np.mgrid[0:h, 0:w]

    # line (class 4): horizontal white stripe
    ly = rng.integers(h // 4, 3 * h // 4)
    stripe = (yy >= ly) & (yy < ly + max(h // 16, 1))
    img[stripe] = 0.9
    lab[stripe] = 4

    # goal (class 3): red vertical posts
    gx = rng.integers(0, w - w // 8)
    post = (xx >= gx) & (xx < gx + max(w // 20, 1)) & (yy < h // 2)
    img[post] = [0.8, 0.1, 0.1]
    lab[post] = 3

    # robot (class 2): green box
    rx, ry = rng.integers(0, w - w // 5), rng.integers(h // 3, h - h // 4)
    box = (xx >= rx) & (xx < rx + w // 6) & (yy >= ry) & (yy < ry + h // 5)
    img[box] = [0.1, 0.7, 0.2]
    lab[box] = 2

    # ball (class 1): blue disc
    cx, cy, r = rng.integers(0, w), rng.integers(h // 2, h), max(h // 10, 2)
    disc = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
    img[disc] = [0.1, 0.2, 0.9]
    lab[disc] = 1

    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), lab


def make_seg_tree(root: str, n_train: int = 12, n_val: int = 6,
                  size=(120, 160), cameras: bool = True, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    h, w = size
    for split, n in [("train", n_train), ("val", n_val)]:
        idir = osp.join(root, split, "images")
        ldir = osp.join(root, split, "labels")
        os.makedirs(idir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n):
            img, lab = _draw_scene(rng, h, w)
            Image.fromarray(img).save(osp.join(idir, f"img{i}.png"))
            Image.fromarray(lab.astype(np.uint8), mode="L").save(
                osp.join(ldir, f"img{i}.png"))
            if cameras:
                with open(osp.join(idir, f"img{i}.txt"), "w") as f:
                    f.write("u" if i % 2 == 0 else "b")


def make_dataset_root(root: str, size=(120, 160), seed: int = 0) -> str:
    """Full root: synthetic tree + FinetuneHorizon + LabelProp + Classification."""
    make_seg_tree(root, size=size, cameras=False, seed=seed)
    make_seg_tree(osp.join(root, "FinetuneHorizon"), size=size, cameras=True,
                  seed=seed + 1)
    make_lp_tree(root, size=size, seed=seed + 2)
    make_classification_tree(osp.join(root, "Classification"), seed=seed + 3)
    return root


def make_lp_tree(root: str, size=(120, 160), n_seq: int = 2, seq_len: int = 5,
                 seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    h, w = size
    for domain in ["Real", "Synthetic"]:
        for split in ["train", "val"]:
            for s in range(n_seq):
                base = osp.join(root, "LabelProp", domain, split, f"seq{s}")
                idir, ldir = osp.join(base, "images"), osp.join(base, "labels")
                os.makedirs(idir, exist_ok=True)
                os.makedirs(ldir, exist_ok=True)
                # a moving scene: shift a base frame
                img0, lab0 = _draw_scene(rng, h, w)
                for t in range(seq_len):
                    shift = t * 2
                    img = np.roll(img0, shift, axis=1)
                    lab = np.roll(lab0, shift, axis=1)
                    Image.fromarray(img).save(osp.join(idir, f"f{t}.png"))
                    Image.fromarray(lab.astype(np.uint8), mode="L").save(
                        osp.join(ldir, f"f{t}.png"))


def make_classification_tree(root: str, n_per_class: int = 6, size=(32, 32),
                             seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    h, w = size
    for split in ["train", "val", "trainBig", "test", "correctBBsTrain", "correctBBs"]:
        for ci, cname in enumerate(["bg", "ball", "robot", "goal"]):
            cdir = osp.join(root, split, cname)
            os.makedirs(cdir, exist_ok=True)
            for i in range(n_per_class):
                img = np.full((h, w, 3), 0.3, np.float32)
                if cname == "ball":
                    yy, xx = np.mgrid[0:h, 0:w]
                    img[(xx - w // 2) ** 2 + (yy - h // 2) ** 2 < (h // 3) ** 2] = [0.1, 0.2, 0.9]
                elif cname == "robot":
                    img[h // 4:3 * h // 4, w // 4:3 * w // 4] = [0.1, 0.7, 0.2]
                elif cname == "goal":
                    img[:, w // 3:w // 2] = [0.8, 0.1, 0.1]
                img += rng.normal(0, 0.05, img.shape).astype(np.float32)
                Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                    osp.join(cdir, f"s{i}.png"))
