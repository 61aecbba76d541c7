"""Checkpoint directory selection: numeric epoch ordering and the
resume-vs-evaluation preference (round-2 review findings: a lexicographic
sort resumed checkpoint9 over checkpoint12, and resume preferred
best.ckpt — silently rewinding completed epochs)."""

import numpy as np

from pmce_tpu.core import checkpoint as ckpt


def _payload(tag, epoch):
    return {"params": {"w": np.full((2,), float(epoch), np.float32)},
            "tag": tag}


def test_latest_numbered_is_numeric(tmp_path):
    d = str(tmp_path)
    for e in (1, 9, 12):
        ckpt.save_checkpoint(d, e, 99, _payload("e", e), is_best=False)
    assert ckpt._latest_numbered(d) == "checkpoint12.ckpt"
    loaded = ckpt.load_checkpoint(d, prefer="latest")
    assert loaded["epoch"] == 12


def test_prefer_latest_skips_best(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 3, 99, _payload("best-at-3", 3), is_best=True)
    ckpt.save_checkpoint(d, 7, 99, _payload("later", 7), is_best=False)
    # Evaluation default: best.
    assert ckpt.load_checkpoint(d)["epoch"] == 3
    # Resume: the LATEST epoch, not the best one.
    assert ckpt.load_checkpoint(d, prefer="latest")["epoch"] == 7


def test_prefer_latest_final_wins(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 7, 9, _payload("mid", 7), is_best=True)
    ckpt.save_checkpoint(d, 9, 9, _payload("final", 9), is_best=False)
    assert ckpt.load_checkpoint(d, prefer="latest")["epoch"] == 9


def test_prefer_latest_falls_back_to_best_only_checkpoint(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 4, 99, _payload("b", 4), is_best=True)
    import os

    os.remove(str(tmp_path / "checkpoint4.ckpt"))
    assert ckpt.load_checkpoint(d, prefer="latest")["epoch"] == 4
