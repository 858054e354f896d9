"""MSLS validation at realistic scale through the device path
(VERDICT r3 item 8): synthetic 30k-database / 3k-query val, sequence task
seq2seq included, wall-clock measured on the real chip, recall parity
asserted against a host-loop embedding oracle.

The real MSLS val cities are this size (reference training_tools/val.py:68-252
iterates ~19k db / ~500q per city); this proves the one-dispatch chunked
extraction (engine/msls_val.py::_embed_names) + fused qg rerank survive the
scale with identical recalls to a per-batch host embedding loop.

64px frames: on THIS host 224px pools are bound by the ~50 MB/s host->device
tunnel (RESULTS.md round 3), so 64px isolates the compute path; the transfer
scaling is documented, not re-measured.

Usage: python scripts/stress_msls_val.py [--n_db 30000] [--n_q 3000]
       [--task im2im|seq2seq] [--trunc 100]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_db", type=int, default=30000)
    ap.add_argument("--n_q", type=int, default=3000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--task", default="im2im")
    ap.add_argument("--seq_length", type=int, default=1)
    ap.add_argument("--trunc", type=int, default=100)
    ap.add_argument("--batch", type=int, default=64)
    # needs an arch whose dense token map lives in EMBED space (head_tokens:
    # ViT/CvT/Swin) — the featvit rerank contracts centers against the bank
    # over the embed channels; ResNet's raw 2048-dim trunk map does not apply
    ap.add_argument("--arch", default="vit_normalize")
    ap.add_argument("--grid", type=int, default=2)
    args = ap.parse_args()
    if args.task != "im2im" and args.seq_length == 1:
        args.seq_length = 3

    from vit_reranking_tpu import models as archs
    from vit_reranking_tpu.core.config import Config
    from vit_reranking_tpu.data.msls import SyntheticMSLS
    from vit_reranking_tpu.engine.msls_val import msls_val, recall_at_n

    t0 = time.time()
    ds = SyntheticMSLS(
        n_queries=args.n_q, n_db=args.n_db, image_size=args.size,
        mode="val", task=args.task, seq_length=args.seq_length,
    )
    print(f"dataset: {len(ds.qImages)} q / {len(ds.dbImages)} db "
          f"task={args.task} L={args.seq_length} ({time.time()-t0:.1f}s)",
          flush=True)

    opt = Config(dataset="synthetic", arch=args.arch, embed_dim=128)
    model = archs.select(args.arch, opt)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, args.size, args.size, 3), jnp.float32), train=False,
    )

    from vit_reranking_tpu.cli.train_msls_baseline import make_extract_fn

    extract = make_extract_fn(model, with_dense=True, grid_size=args.grid)

    # ---- device path: msls_val end to end (global + DIML rerank) ----------
    print("msls_val (one-dispatch chunked extraction + fused qg rerank)...",
          flush=True)
    t0 = time.time()
    recalls = msls_val(
        ds, extract, trunc_nums=(0, args.trunc), batch=args.batch,
        variables=variables,
    )
    t_val = time.time() - t0
    print(f"msls_val wall-clock: {t_val:.1f} s "
          f"({(len(ds.qImages)+len(ds.dbImages))*max(1,args.seq_length)} frames embedded, "
          f"trunc {args.trunc} rerank included)", flush=True)
    for k, v in sorted(recalls.items()):
        print(f"  {k}: {v:.4f}")

    # ---- host-loop oracle: per-batch jitted embed, numpy ranking ----------
    # The per-forward FRAME GEOMETRY must mirror the device path exactly
    # (msls_val._chunk_geometry): on TPU the compiled matmul tiling depends
    # on the batch shape, so embedding 64 keys x L frames as one (64*L,)
    # dispatch instead of the device path's (batch,)-frame slices produces
    # ~1e-3-level embedding differences that flip near-tied ranks on random
    # data (observed: seq2seq R@10 |d|=0.005 before this mirror; im2im was
    # bit-exact because both paths already used (batch,)-frame forwards).
    print("host-loop oracle (same math, per-batch dispatch)...", flush=True)
    t0 = time.time()
    from vit_reranking_tpu.engine.msls_val import _chunk_geometry

    em = jax.jit(lambda v, x: extract(v, x)[0])

    def embed_names(names):
        first = ds._load_key(names[0])
        L = first.shape[0] if first.ndim == 4 else 1
        keys_per_chunk, chunk_frames = _chunk_geometry(
            len(names), L, args.batch
        )
        outs = []
        for s in range(0, len(names), keys_per_chunk):
            frames = []
            for key in names[s : s + keys_per_chunk]:
                arr = ds._load_key(key)  # (L, H, W, 3) or (H, W, 3)
                frames.append(arr if arr.ndim == 4 else arr[None])
            flat = np.concatenate(frames, 0)
            m = flat.shape[0]
            if m < chunk_frames:
                flat = np.concatenate(
                    [flat, np.zeros((chunk_frames - m, *flat.shape[1:]),
                                    flat.dtype)]
                )
            # per-batch dispatch at the device path's slice boundaries
            e = np.concatenate(
                [
                    np.asarray(em(variables, jnp.asarray(
                        flat[b : b + args.batch]
                    )))
                    for b in range(0, chunk_frames, args.batch)
                ],
                0,
            )[:m]
            outs.append(e)
        e = np.concatenate(outs, 0)
        return ds.aggregate_seq(e, L) if L > 1 else e

    qF = embed_names(list(ds.qImages))
    dbF = embed_names(list(ds.dbImages))
    sims = qF @ dbF.T
    nmax = 100
    preds = np.argsort(-sims, axis=1)[:, :nmax]
    n_values = [1, 5, 10, 20, 50, 100]
    oracle = np.asarray(
        recall_at_n([preds], ds.all_pos_indices, n_values, len(ds.qIdx))
    )
    t_or = time.time() - t0
    print(f"oracle wall-clock: {t_or:.1f} s (host per-batch loop)", flush=True)

    for i, n in enumerate(n_values):
        dev = recalls[f"globalR_{n}"]
        diff = abs(dev - oracle[i])
        print(f"  R@{n}: device {dev:.4f} vs oracle {oracle[i]:.4f} "
              f"(|d| {diff:.4f})")
        assert diff <= 0.002, (n, dev, oracle[i])
    print(f"PARITY OK; device path {t_or / t_val:.1f}x the host loop "
          f"at this geometry", flush=True)


if __name__ == "__main__":
    main()
