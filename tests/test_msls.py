"""MSLS stack tests on the synthetic dataset: mining, val recalls, losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_reranking_tpu.data.msls import SyntheticMSLS
from vit_reranking_tpu.engine.msls_val import msls_val
from vit_reranking_tpu.losses.msls import (
    ada_xbm_triplet_loss,
    hkd_loss,
    msls_triplet_loss,
    rkd_angle,
    rkd_distance,
    supcon_loss,
    xbm_triplet_loss,
)


@pytest.fixture(scope="module")
def msls():
    return SyntheticMSLS(n_queries=24, n_db=48, nNeg=2, image_size=32, seed=0)


def oracle_embed(ds):
    """Perfect embeddings: a smooth function of UTM position (nearby places
    get similar embeddings)."""

    def fn(imgs):
        # imgs are rendered from UTM — instead embed via global average pooling
        # of the image itself (image content is a function of UTM).  jnp ops
        # only: msls_val traces extract_fn inside its compiled chunk program.
        imgs = jnp.asarray(imgs)
        x = imgs.reshape(imgs.shape[0], -1, 3).mean(1)
        x = jnp.concatenate([x, imgs.reshape(imgs.shape[0], 8, -1).mean(-1)], -1)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    return fn


def test_mining_produces_valid_triplets(msls):
    msls.new_epoch()
    msls.update_subcache(oracle_embed(msls), outputdim=None)
    assert len(msls.triplets) > 0
    for (trip, target) in msls.triplets:
        qidx, pidx, *negs = trip
        # positive within pos range, negatives outside nonNeg range
        qpos = np.where(msls.qIdx == qidx)[0][0]
        assert pidx in msls.pIdx[qpos]
        for n in negs:
            assert n not in np.asarray(msls.nonNegIdx[qpos])


def test_mining_without_model(msls):
    msls.new_epoch()
    msls.update_subcache(None)
    assert len(msls.triplets) == min(msls.cached_queries, len(msls.qIdx))


def test_getitem_and_collate(msls):
    msls.new_epoch()
    msls.update_subcache(None)
    items = [msls[i] for i in range(4)]
    q, p, negs, counts, idxs = SyntheticMSLS.collate_fn(items)
    assert q.shape[0] == 4 and p.shape[0] == 4
    assert negs.shape[0] == 4 * msls.nNeg


def test_msls_val_recall(msls):
    emb = oracle_embed(msls)

    def extract(imgs):
        return emb(imgs), None

    recalls = msls_val(msls, extract, trunc_nums=(0,), batch=8)
    assert "globalR_1" in recalls
    # smooth UTM-derived embeddings must retrieve nearby places well
    assert recalls["globalR_5"] > 0.5, recalls


def test_recall_at_n_matches_reference_loop():
    """The vectorized Recall@N (engine/msls_val.py::recall_at_n) must
    value-match a literal transcription of the reference's per-row loop
    (reference training_tools/val.py:211-226): for each query, the first
    rank n whose pred[:n] intersects gt credits correct_at_n[i:]."""
    from vit_reranking_tpu.engine.msls_val import recall_at_n

    rng = np.random.default_rng(11)
    n_values = [1, 5, 10, 20, 50, 100]
    # two "cities" with different query counts and kk < max(n_values)
    pred_list = [
        rng.integers(0, 60, size=(13, 30)).astype(np.int64),
        rng.integers(0, 60, size=(7, 30)).astype(np.int64),
    ]
    n_queries = 13 + 7
    gt = []
    for q in range(n_queries):
        k = int(rng.integers(0, 5))  # some queries have NO positives
        gt.append(rng.integers(0, 60, size=k).astype(np.int64))

    ours = recall_at_n(pred_list, gt, n_values, n_queries)

    # literal transcription of val.py:213-226
    predictions = np.vstack(pred_list)
    correct_at_n = np.zeros(len(n_values))
    for qIx, pred in enumerate(predictions):
        for i, n in enumerate(n_values):
            if np.any(np.in1d(pred[:n], gt[qIx])):
                correct_at_n[i:] += 1
                break
    ref = correct_at_n / n_queries

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-12)


def test_msls_losses_finite():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32))
    assert np.isfinite(float(rkd_distance(s, t)))
    assert np.isfinite(float(rkd_angle(s, t)))
    labels = jnp.asarray(np.arange(12) % 3)
    feats = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
    assert np.isfinite(float(supcon_loss(feats, labels)))
    # hkd over (q, p, negs) stacking: bs=3, nNeg=2 -> 3+3+6 = 12 rows
    assert np.isfinite(float(hkd_loss(s, t, bs=3, temperature=0.1)))
    q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((4, 2, 16)).astype(np.float32))
    tl = msls_triplet_loss(q, p, n)
    assert np.isfinite(float(tl)) and float(tl) >= 0


def test_xbm_losses():
    rng = np.random.default_rng(1)
    col = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    col = col / jnp.linalg.norm(col, axis=-1, keepdims=True)
    row = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
    row = row / jnp.linalg.norm(row, axis=-1, keepdims=True)
    query_rows = jnp.asarray([0, 2, 4])
    pos_mask = jnp.zeros((3, 20), bool).at[:, :2].set(True)
    neg_mask = jnp.zeros((3, 20), bool).at[:, 5:].set(True)
    l1 = xbm_triplet_loss(col, row, query_rows, pos_mask, neg_mask)
    assert np.isfinite(float(l1))
    pos_rows = jnp.asarray([0, 1, 0])
    l2, g = jax.value_and_grad(
        lambda c: ada_xbm_triplet_loss(c, row, query_rows, pos_rows, neg_mask)
    )(col)
    assert np.isfinite(float(l2))
    assert np.all(np.isfinite(np.asarray(g)))


def test_train_msls_smoke_synthetic():
    """One tiny end-to-end epoch through the CLI main."""
    from vit_reranking_tpu.cli.train_msls_baseline import main

    r5 = main([
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--n_epochs", "1", "--evalevery", "1",
        "--nNeg", "2", "--lr", "0.0001", "--save_path", "/tmp/msls_runs",
        "--group", "test", "--bs", "4", "--track_drift",
    ])
    assert 0.0 <= r5 <= 1.0
    # drift tracking left per-subcache val-feature snapshots behind
    import glob
    assert glob.glob("/tmp/msls_runs/**/feat_*.npz", recursive=True)


def test_subcache_checkpoint_resume(tmp_path):
    """VERDICT r4 item 6: preempt after subcache k, restore, and the mining
    for subcache k+1 is BIT-IDENTICAL to the uninterrupted run — the
    mining_state snapshot carries the RNG stream, negCache, subcache split,
    and subset cursor across the pickle round trip."""
    import pickle

    mk = lambda: SyntheticMSLS(
        n_queries=24, n_db=48, nNeg=2, image_size=32, seed=0,
        cached_queries=8, cached_negatives=24,
    )
    # uninterrupted run: subcaches 0 and 1
    a = mk()
    a.new_epoch()
    assert a.nCacheSubset >= 2
    a.update_subcache(oracle_embed(a), outputdim=None)
    snap = pickle.loads(pickle.dumps(a.mining_state()))
    a.update_subcache(oracle_embed(a), outputdim=None)
    trips_a = [tuple(t) for t, _ in a.triplets]

    # "preempted" run: fresh dataset (same ctor seed), restore the snapshot
    # taken after subcache 0, mine subcache 1 only
    b = mk()
    b.rng = np.random.default_rng(12345)  # prove restore overrides the rng
    b.set_mining_state(snap)
    assert b.current_subset == a.current_subset - 1
    b.update_subcache(oracle_embed(b), outputdim=None)
    trips_b = [tuple(t) for t, _ in b.triplets]
    assert trips_a == trips_b and len(trips_a) > 0


def test_train_msls_resume_cli(tmp_path):
    """End-to-end wiring: --checkpoint_every_steps writes latest +
    latest_mining.pkl at subcache boundaries; --resume_path restores model,
    optimizer, it_count, and mining state through the real CLI main."""
    import glob
    import os

    from vit_reranking_tpu.cli.train_msls_baseline import main

    args = [
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--n_epochs", "1", "--evalevery", "5",
        "--nNeg", "2", "--lr", "0.0001", "--save_path", str(tmp_path),
        "--group", "resume", "--bs", "4", "--checkpoint_every_steps", "1",
    ]
    main(args)
    pkls = glob.glob(f"{tmp_path}/**/latest_mining.pkl", recursive=True)
    assert pkls, "subcache checkpoint did not write the mining state"
    run_dir = os.path.dirname(pkls[0])
    assert os.path.exists(f"{run_dir}/latest")
    # resume from the final subcache boundary and extend by one epoch
    args2 = list(args)
    args2[args2.index("--n_epochs") + 1] = "2"
    r5 = main(args2 + ["--resume_path", f"{run_dir}/latest"])
    assert 0.0 <= r5 <= 1.0


def test_msls_val_with_rerank(msls):
    """DIML rerank path in MSLS val (dimlR_N keys)."""
    emb = oracle_embed(msls)

    def extract(imgs):
        c = emb(imgs)
        # synthesize dense patch features correlated with the global ones
        d = np.repeat(c[:, :, None], 4, axis=2).astype(np.float32)
        d += 0.01 * np.random.default_rng(0).standard_normal(d.shape).astype(np.float32)
        return c, d

    recalls = msls_val(msls, extract, trunc_nums=(0, 8), batch=8)
    assert "dimlR_5" in recalls
    assert 0.0 <= recalls["dimlR_5"] <= 1.0


def test_netvlad_cluster_init():
    from vit_reranking_tpu.engine.clusters import init_netvlad_clusters

    rng = np.random.default_rng(0)

    def encoder(images):
        B = images.shape[0]
        return jnp.asarray(rng.standard_normal((B, 4, 4, 16)).astype(np.float32))

    batches = [np.zeros((4, 32, 32, 3), np.float32) for _ in range(4)]
    init = init_netvlad_clusters(encoder, iter(batches), num_clusters=4,
                                 n_descriptors=200, per_image=16)
    assert init["centroids"].shape == (4, 16)
    assert init["conv_kernel"].shape == (16, 4)


# ---- sequence tasks (im2seq/seq2im/seq2seq, reference msls.py:126-133) ----


@pytest.fixture(scope="module")
def msls_seq():
    return SyntheticMSLS(
        n_queries=24, n_db=48, nNeg=2, image_size=32, seed=0,
        task="seq2seq", seq_length=3,
    )


def test_seq_keys_and_loading(msls_seq):
    assert msls_seq.seq_length_q == 3 and msls_seq.seq_length_db == 3
    key = msls_seq.qImages[0]
    assert key.count(",") == 2  # 3 comma-joined frames
    arr = msls_seq.load_image_array(key)
    assert arr.shape == (3, 32, 32, 3)
    # center frame == the plain frame rendered at the query's own UTM
    center = msls_seq.load_frame(key.split(",")[1])
    np.testing.assert_array_equal(arr[1], center)


def test_seq_getitem_and_collate(msls_seq):
    msls_seq.new_epoch()
    msls_seq.update_subcache(None)
    items = [msls_seq[i] for i in range(4)]
    q, p, negs, counts, idxs = SyntheticMSLS.collate_fn(items)
    assert q.shape == (4, 3, 32, 32, 3)
    assert p.shape == (4, 3, 32, 32, 3)
    assert negs.shape == (4 * msls_seq.nNeg, 3, 32, 32, 3)


def test_seq_mining_aggregates_frames(msls_seq):
    msls_seq.new_epoch()
    msls_seq.update_subcache(oracle_embed(msls_seq), outputdim=None)
    assert len(msls_seq.triplets) > 0
    for (trip, target) in msls_seq.triplets:
        qidx, pidx, *negs = trip
        qpos = np.where(msls_seq.qIdx == qidx)[0][0]
        assert pidx in msls_seq.pIdx[qpos]
        for n in negs:
            assert n not in np.asarray(msls_seq.nonNegIdx[qpos])


def test_seq_msls_val_recall(msls_seq):
    emb = oracle_embed(msls_seq)

    def extract(imgs):
        assert imgs.ndim == 4  # the engine must only feed frame batches
        return emb(imgs), None

    recalls = msls_val(msls_seq, extract, trunc_nums=(0,), batch=8)
    assert recalls["globalR_5"] > 0.5, recalls


def test_seq_msls_val_with_rerank_center_frame(msls_seq):
    emb = oracle_embed(msls_seq)

    def extract(imgs):
        c = emb(imgs)
        d = np.repeat(c[:, :, None], 4, axis=2).astype(np.float32)
        return c, d

    recalls = msls_val(msls_seq, extract, trunc_nums=(0, 8), batch=8)
    assert "dimlR_5" in recalls
    assert 0.0 <= recalls["dimlR_5"] <= 1.0


def test_train_msls_seq2seq_smoke():
    """One tiny seq2seq epoch end-to-end through the CLI (verdict item 3)."""
    import tempfile
    from vit_reranking_tpu.cli.train_msls_baseline import main

    with tempfile.TemporaryDirectory() as tmp:
        r5 = main([
            "--dataset", "synthetic", "--arch", "resnet50_normalize",
            "--msls_task", "seq2seq", "--msls_seq_length", "3",
            "--n_epochs", "1", "--embed_dim", "16", "--nNeg", "2",
            "--save_path", tmp, "--evalevery", "1", "--group", "test", "--bs", "4",
        ])
        assert 0.0 <= r5 <= 1.0


def test_seq_embed_names_matches_per_key_oracle():
    """_embed_names sequence parity vs a per-key host oracle (VERDICT r3
    item 8's suite-level assertion): for every key, embedding its L frames
    directly and aggregating must equal the super-chunked device path —
    across a geometry where keys_per_chunk*L is NOT a multiple of batch
    (85 keys * 3 frames = 255, padded to chunk_frames=256), so chunk
    padding, frame-order alignment, and crop are all exercised.  On the CPU
    mesh this is bit-exact; on TPU only the per-forward batch shape
    perturbs numerics (see scripts/stress_msls_val.py's geometry-mirroring
    oracle and test_results/stress_msls_r4.log)."""
    from vit_reranking_tpu.data.msls import MSLS
    from vit_reranking_tpu.engine.msls_val import _chunk_geometry, _embed_names

    ds = SyntheticMSLS(
        n_queries=20, n_db=100, nNeg=2, image_size=32, seed=3,
        task="seq2seq", seq_length=3,
    )
    emb = oracle_embed(ds)

    def extract(imgs):
        c = emb(imgs)
        return c, c[:, :, None] * jnp.ones((1, 1, 4), jnp.float32)

    names = list(ds.dbImages)
    kpc, cf = _chunk_geometry(len(names), 3, 8)
    assert (kpc * 3) % 8 != 0, "geometry must cross batch boundaries"
    assert len(names) > kpc, "need >1 chunk to exercise the chunk loop"

    centers, dense = _embed_names(ds, names, extract, batch=8)

    # per-key oracle: L frames embedded directly, aggregated; dense from the
    # center frame (the engine's documented seq semantics)
    for i, key in enumerate(names[:: max(len(names) // 17, 1)]):
        frames = ds.load_image_array(key)  # (L, H, W, 3)
        c, d = extract(jnp.asarray(frames))
        want_center = MSLS.aggregate_seq(np.asarray(c), frames.shape[0])[0]
        j = i * max(len(names) // 17, 1)
        np.testing.assert_allclose(centers[j], want_center, atol=1e-6)
        np.testing.assert_allclose(
            dense[j], np.asarray(d)[frames.shape[0] // 2], atol=1e-6
        )


def test_msls_val_variables_contract(msls):
    """The runtime-parameters contract: extract_fn(variables, images) with
    ``variables=`` must give the same recalls as the closure contract, and
    the chunk program must be shared across different parameter values
    (no retrace per epoch — the fix for the per-eval recompile)."""
    from vit_reranking_tpu.engine.msls_val import _make_pool_extract

    emb = oracle_embed(msls)

    def extract_v(variables, imgs):
        return emb(imgs) * variables["scale"], None

    def extract_closure(imgs):
        return emb(imgs), None

    ones = {"scale": jnp.float32(1.0)}
    r_vars = msls_val(msls, extract_v, trunc_nums=(0,), batch=8, variables=ones)
    r_clos = msls_val(msls, extract_closure, trunc_nums=(0,), batch=8)
    for k, v in r_clos.items():
        assert abs(r_vars[k] - v) < 1e-6, (k, r_vars[k], v)

    # same compiled program object for any parameter value
    run_a = _make_pool_extract(extract_v, 8, True)
    run_b = _make_pool_extract(extract_v, 8, True)
    assert run_a is run_b
