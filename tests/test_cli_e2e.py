"""CLI wiring end-to-end smoke: train -> checkpoint -> rerank eval through the
actual entry points on the CPU mesh (catches registry/flag/IO regressions)."""

import os

import numpy as np
import pytest


ARGS_COMMON = [
    "--dataset", "synthetic", "--synthetic_size", "32", "--synthetic_classes", "4",
    "--synthetic_per_class", "8", "--kernels", "1", "--bs", "8",
]


def test_train_then_eval(tmp_path):
    from vit_reranking_tpu.cli.train_baseline import main as train_main
    from vit_reranking_tpu.cli.test_diml import main as eval_main

    r1 = train_main(ARGS_COMMON + [
        "--arch", "resnet50_normalize", "--loss", "margin",
        "--batch_mining", "distance", "--n_epochs", "1", "--evalevery", "1",
        "--lr", "0.0001", "--save_path", str(tmp_path), "--group", "cli",
    ])
    assert 0.0 <= r1 <= 100.0
    ckpt = os.path.join(str(tmp_path), "synthetic", "cli_s1", "best")
    assert os.path.isdir(ckpt)

    cwd = os.getcwd()
    os.chdir(tmp_path)  # results CSV lands under tmp
    try:
        res = eval_main(ARGS_COMMON + [
            "--arch", "resnet50_normalize", "--resume_path", ckpt,
            "--use_uniform", "--use_ot", "--grid_size", "1",
            "--save_path", str(tmp_path),
        ])
    finally:
        os.chdir(cwd)
    assert np.isfinite(res["r1"][0])
    assert (tmp_path / "test_results" / "test_diml_synthetic.csv").exists()


def test_step_granular_checkpoint(tmp_path):
    """--checkpoint_every_steps refreshes `latest` mid-epoch and the saved
    tree resumes (cli/common.py::maybe_step_checkpoint; VERDICT r3 item 6)."""
    from vit_reranking_tpu.cli.train_baseline import main as train_main

    train_main(ARGS_COMMON + [
        "--arch", "resnet50_normalize", "--loss", "margin",
        "--batch_mining", "distance", "--n_epochs", "1", "--evalevery", "5",
        "--lr", "0.0001", "--save_path", str(tmp_path), "--group", "stepck",
        "--checkpoint_every_steps", "2",
    ])
    ckpt = os.path.join(str(tmp_path), "synthetic", "stepck_s1", "latest")
    # 32 imgs / bs 8 = 4 steps -> saves at steps 2 and 4 even though the
    # eval epoch never fires (evalevery 5 > n_epochs)
    assert os.path.isdir(ckpt)
    # and it resumes
    r1 = train_main(ARGS_COMMON + [
        "--arch", "resnet50_normalize", "--loss", "margin",
        "--batch_mining", "distance", "--n_epochs", "1", "--evalevery", "1",
        "--lr", "0.0001", "--save_path", str(tmp_path), "--group", "stepck2",
        "--resume_path", ckpt,
    ])
    assert 0.0 <= r1 <= 100.0
