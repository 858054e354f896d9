"""DIML rerank evaluation — generic engine behind the test_diml_* entry points
(reference test_diml_cvt.py / test_diml_base.py / test_diml_vit.py /
test_diml_swin.py).

Loads a checkpoint, embeds the test split (with rollout extraction for the
flagship CvT path), runs stage-0 retrieval + OT rerank for every requested
truncation, prints the metric table and appends a row to
``test_results/test_diml_{dataset}.csv`` (reference test_diml_cvt.py:155-161).
"""

from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import models as archs
from ..core.checkpoint import load_checkpoint
from ..core.config import Config, from_args
from ..data.loader import build_dataset
from ..engine.extract import extract_features
from ..engine.rerank_eval import rerank_evaluate
from .common import load_pretrained_into, seed_everything


def extract_cam_bank(opt: Config, loader) -> np.ndarray:
    """Grad-CAM saliency bank (N, R) from a separate ResNet-50 CAM source
    model (the reference instantiates an ImageNet classifier ResNet-50 for
    this, eval_attn_diml.py:60-64,157-158; pass --cam_ckpt pointing at a
    torch resnet50 state to reproduce it bit-for-bit — random init in
    zero-egress environments still exercises the full path)."""
    from ..models.resnet import ResNet50Network
    from ..utils.cam import grad_cam

    cam_model = ResNet50Network(embed_dim=1000, normalize=False)
    cams = []
    cam_vars = None
    cam_fn = None
    for _, images, _ in loader:
        images = np.asarray(images, np.float32)
        if cam_vars is None:
            sample = jnp.asarray(images[:2])
            cam_vars = cam_model.init(
                {"params": jax.random.PRNGKey(7)}, sample, train=False
            )
            if opt.cam_ckpt:
                import torch

                from ..core.convert import convert_resnet50

                sd = torch.load(opt.cam_ckpt, map_location="cpu")
                params, stats = convert_resnet50(sd)
                p = dict(cam_vars["params"])
                p["trunk"] = params["trunk"]
                if "fc.weight" in sd:  # the ImageNet classifier head
                    p["last_linear"] = {
                        "kernel": np.asarray(sd["fc.weight"]).T,
                        "bias": np.asarray(sd["fc.bias"]),
                    }
                cam_vars = {"params": p, "batch_stats": stats}
            cam_fn = jax.jit(
                lambda imgs: grad_cam(cam_model, cam_vars, imgs, grid=opt.grid_size)
            )
        B = opt.bs
        n = images.shape[0]
        if n < B:
            images = np.concatenate(
                [images, np.zeros((B - n, *images.shape[1:]), images.dtype)]
            )
        cams.append(np.asarray(cam_fn(jnp.asarray(images)))[:n].reshape(n, -1))
    return np.concatenate(cams, 0)


def run_eval(opt: Config, trunc_nums=(0, 100)):
    seed_everything(opt.seed, debug=opt.debug)
    loaders, _ = build_dataset(opt)
    test_loader = loaders["testing"]

    model = archs.select(opt.arch, opt)
    _, images0, _ = next(iter(test_loader))
    variables = model.init(
        {"params": jax.random.PRNGKey(opt.seed)}, jnp.asarray(images0[:2]), train=False
    )
    variables = load_pretrained_into(opt, variables)
    if opt.resume_path:
        restored = load_checkpoint(opt.resume_path)
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }

    # feature-bank caching (reference eval_diml.py:69-77 caches feat.pt)
    cache_file = None
    if opt.cache_path:
        os.makedirs(opt.cache_path, exist_ok=True)
        ck = os.path.basename(opt.resume_path or opt.pretrained_ckpt or "init")
        tag = f"{opt.dataset}_{opt.arch}_g{opt.grid_size}_{ck}" + (
            "_rollout" if opt.use_rollout else ""
        ) + ("_qk" if opt.use_qk else "") + ("_cam" if opt.use_cam else "")
        cache_file = os.path.join(opt.cache_path, f"feat_{tag}.npz")

    from ..core.profiler import PhaseTimer, trace

    timer = PhaseTimer()
    t0 = time.time()
    if cache_file and os.path.exists(cache_file):
        feats = dict(np.load(cache_file))
        print(f"loaded cached features from {cache_file}")
    else:
        with trace(), timer.phase("extract", items=0):
            if opt.cache_device:
                # device-resident pool + one-dispatch extraction (the 224px
                # image stream is transfer-bound on slow host links;
                # data/device_cache.py::DeviceEvalCache)
                from ..data.device_cache import DeviceEvalCache
                from ..engine.extract import extract_features_device

                ec = DeviceEvalCache.from_dataset(test_loader.dataset)
                res = extract_features_device(
                    model, variables, ec.images, batch_size=opt.bs,
                    grid_size=opt.grid_size, use_rollout=opt.use_rollout,
                    use_qk=opt.use_qk, training_mode=opt.training,
                    uint8_input=not ec.normalized,
                )
                feats = {k: np.asarray(v) for k, v in res.items()}
                feats["labels"] = ec.labels
            else:
                feats = extract_features(
                    model, variables, test_loader,
                    grid_size=opt.grid_size,
                    use_rollout=opt.use_rollout,
                    use_qk=opt.use_qk,
                    training_mode=opt.training,
                    pad_batch=opt.bs,
                )
            if opt.use_cam:
                feats["cam"] = extract_cam_bank(opt, test_loader)
        timer.items["extract"] = len(feats["labels"])
        if cache_file:
            np.savez(cache_file, **feats)
    print(f"embedded {len(feats['labels'])} images in {time.time()-t0:.1f}s")

    method = (
        "cam" if opt.use_cam
        else "rollout" if opt.use_rollout
        else "qk" if opt.use_qk
        else "mhvit" if opt.use_mh
        else "dist" if opt.use_dist
        else "featvit"
    )
    flags = dict(
        use_uniform=opt.use_uniform,
        use_inverse=opt.use_inverse,
        temperature=opt.temperature,
        use_cls_token=opt.use_cls_token,
        use_minus=opt.use_minus,
        use_soft=opt.use_soft,
        ot_part=opt.ot_part,
        use_ot=opt.use_ot,
        # reference scale: ViT q.k / 8 (diml.py:235), CvT unscaled (diml.py:292)
        qk_scale=1.0 if opt.arch.startswith("cvt") else 1.0 / 8.0,
        mh_heads=opt.mh_heads,
    )
    trunc_nums = tuple(t for t in trunc_nums if t == 0 or t < len(feats["labels"]))
    if method == "rollout":
        aux_bank, aux_g = jnp.asarray(feats["rollout"]), None
    elif method == "qk":
        aux_bank, aux_g = jnp.asarray(feats["q"]), jnp.asarray(feats["k"])
    elif method == "cam":
        aux_bank, aux_g = jnp.asarray(feats["cam"]), None
    else:
        aux_bank, aux_g = None, None
    t0 = time.time()
    with trace(), timer.phase("rerank", items=len(feats["labels"]) * max(trunc_nums)):
        results = rerank_evaluate(
            jnp.asarray(feats["bank"]),
            jnp.asarray(feats["center"]),
            jnp.asarray(feats["labels"]),
            rollout=aux_bank,
            rollout_g=aux_g,
            trunc_nums=trunc_nums,
            method=method,
            flags=flags,
            approx_topk=getattr(opt, "approx_topk", False),
            stream_dtype=(
                "bfloat16" if getattr(opt, "rerank_bf16", False) else "float32"
            ),
        )
    dt = time.time() - t0
    n_pairs = len(feats["labels"]) * max(trunc_nums)
    print(f"rerank eval in {dt:.1f}s ({n_pairs/max(dt,1e-9):,.0f} pairs/s)")
    print("phase timings:", timer.summary())
    if opt.cache_path:
        timer.dump(os.path.join(opt.cache_path, "timings.json"))

    for trunc in trunc_nums:
        print(f"trunc_num: {trunc}, ot part: {opt.ot_part}")
        print("###########")
        print(
            "Now rank-1 acc=%f, RP=%f, MAP@R=%f"
            % (results["r1"][trunc], results["rp"][trunc], results["mapr"][trunc])
        )

    os.makedirs("test_results", exist_ok=True)
    out_csv = f"test_results/test_diml_{opt.dataset}.csv"
    write_header = not os.path.exists(out_csv)
    with open(out_csv, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(
                ["arch", "grid", "ot_part", "method"]
                + [f"{m}@{t}" for m in ("r1", "rp", "mapr") for t in trunc_nums]
            )
        w.writerow(
            [opt.arch, opt.grid_size, opt.ot_part, method]
            + [round(results[m][t], 4) for m in ("r1", "rp", "mapr") for t in trunc_nums]
        )
    return results


def sweep(opt: Config, runs_root: str, trunc_nums=(0, 100)):
    """Evaluate every trained run under ``runs_root`` (the reference's LOGS
    sweep tables, test_diml.py:100-183: one row per training objective) and
    write a combined table."""
    rows = []
    for name in sorted(os.listdir(runs_root)):
        ckpt = os.path.join(runs_root, name, "best")
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(runs_root, name, "latest")
            if not os.path.isdir(ckpt):
                continue
        print(f"=== {name} ===")
        res = run_eval(opt.replace(resume_path=ckpt, group=name), trunc_nums)
        rows.append((name, res))
    os.makedirs("test_results", exist_ok=True)
    out_csv = f"test_results/sweep_{opt.dataset}.csv"
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["run"] + [f"{m}@{t}" for m in ("r1", "rp", "mapr") for t in trunc_nums]
        )
        for name, res in rows:
            w.writerow(
                [name]
                + [round(res[m][t], 4) for m in ("r1", "rp", "mapr") for t in trunc_nums]
            )
    print(f"sweep table written to {out_csv}")
    return rows


def main(argv=None):
    import argparse

    sweep_root = None
    if argv and "--sweep" in argv:
        i = argv.index("--sweep")
        sweep_root = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    elif argv is None:
        import sys

        if "--sweep" in sys.argv:
            i = sys.argv.index("--sweep")
            sweep_root = sys.argv[i + 1]
            sys.argv = sys.argv[:i] + sys.argv[i + 2 :]
    opt = from_args(argv)
    if sweep_root:
        return sweep(opt, sweep_root, trunc_nums=(0, 100))
    return run_eval(opt, trunc_nums=(0, 100))


if __name__ == "__main__":
    main()
