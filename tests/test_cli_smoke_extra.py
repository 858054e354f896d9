"""Smoke coverage for the CLI mains not exercised elsewhere:
test_msls_baseline (recall eval), test_cls_token (cluster probe), and
train_crossvit (cross-attention rescorer).  Synthetic datasets, tiny shapes,
assert finite/plausible outputs."""

import numpy as np


def test_msls_recall_cli_synthetic(tmp_path):
    from vit_reranking_tpu.cli.test_msls_baseline import main

    recalls = main([
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--nNeg", "2", "--seed", "0",
        "--save_path", str(tmp_path),
    ])
    assert "globalR_5" in recalls
    assert all(0.0 <= v <= 1.0 for v in recalls.values())


def test_cls_token_cli_synthetic(tmp_path):
    from vit_reranking_tpu.cli.test_cls_token import main

    nmis = main([
        "--dataset", "synthetic", "--arch", "vit_normalize",
        "--embed_dim", "16", "--bs", "8", "--seed", "0",
        "--save_path", str(tmp_path),
        "--synthetic_size", "32", "--synthetic_classes", "4",
    ])
    assert len(nmis) >= 1
    assert all(np.isfinite(v) and 0.0 <= v <= 1.0 for v in nmis.values())
    assert (tmp_path / "cls_cluster.png").exists()


def test_train_crossvit_cli_synthetic(tmp_path):
    from vit_reranking_tpu.cli.train_crossvit import main

    out = main([
        "--dataset", "synthetic", "--arch", "vit_normalize",
        "--embed_dim", "16", "--bs", "8", "--n_epochs", "1",
        "--seed", "0", "--save_path", str(tmp_path), "--group", "smoke",
        "--synthetic_size", "32", "--synthetic_classes", "4",
        "--cross_attn_depth", "1",
    ])
    assert np.isfinite(out)


def test_diml_cli_dormant_variants(tmp_path):
    """--use_mh (per-head OT, diml.py:424-472) and --use_dist (OT-weighted
    L2, diml.py:149-203) reachable from the eval CLI."""
    import os

    from vit_reranking_tpu.cli.test_diml import main

    # 128 images so the trunc-100 rerank actually runs (the CLI's trunc list
    # is the reference's hardcoded [0, 100], test_diml_cvt.py:130) — this is
    # what catches bank-dim vs center-dim contract bugs in the tile
    args = [
        "--dataset", "synthetic", "--synthetic_size", "32",
        "--synthetic_classes", "4", "--synthetic_per_class", "32",
        "--kernels", "1", "--bs", "8", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--use_ot", "--grid_size", "1",
        "--save_path", str(tmp_path),
    ]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res_mh = main(args + ["--use_mh", "--mh_heads", "4"])
        res_dist = main(args + ["--use_dist"])
    finally:
        os.chdir(cwd)
    for res in (res_mh, res_dist):
        for m in ("r1", "rp", "mapr"):
            assert set(res[m]) == {0, 100}
            assert all(np.isfinite(v) for v in res[m].values()), res
