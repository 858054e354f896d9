"""Discriminative quality-parity runs for the flipped precision defaults
(VERDICT r4 item 3).

The r4 parity instrument (8 classes x 16 images) saturated at R@1=100 for
every config, so the bf16 / narrow_sm / kv-resident default flips were
justified by a metric that could not discriminate.  This harness re-runs the
default recipes against their f32 counterparts on the HARD synthetic
protocol (64 classes x 8 images with the gain/shift nuisance,
data/datasets.py::SyntheticDataset) where trajectory divergences show up in
R@1/RP/MAP@R instead of pinning at 100.

Operating point (calibrated on the chip, resnet50 12 epochs lr 1e-3 —
test_results/parity_quality_r5.log preamble): difficulty is governed by two
coupled knobs — sep scales the inter-class signal linearly, and ANY
sep != 1.0 additionally switches on the per-image gain/shift nuisance.  The
cliff is sharp: sep 1.0 -> R@1 100 (saturated), 0.6 -> ~8 (chance-ish),
0.2 -> ~2; lr 1e-4 never leaves chance at ANY sep in this step budget (64
classes need lr 1e-3 from scratch).  The shipped default lands mid-range.

Protocol per arch: train N epochs with --evalevery 2 via the REAL CLI entry
point (subprocess), parse every eval line, compare f32 vs the shipping
default (bf16+narrow_sm where applicable, KV-resident attention for CvT).
Verdict rule: the calibration showed epoch-to-epoch R@1 swings of ~+-5 at
the operating point (and +-15 at easier ones) — a single final-epoch delta
is noise — so configs are compared on the MEAN OF THE LAST 3 EVALS, flagged
for reversion when |delta| exceeds the 5-point epoch-swing band.  The full
trajectories are printed so the table can be audited.

Usage: python scripts/parity_quality.py [--arches cvt vit swin resnet]
         [--epochs 12] [--sep ...] [--seeds 0] [--tune]
  --tune: single resnet run per sep value to pick the operating point.

Reference match: metric protocol evaluation/metrics.py:26-45; canonical
recipes scripts/baselines/*.sh; BASELINE.md +-0.2 parity gate.
"""

import argparse
import ast
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARCH_NAMES = {
    "cvt": "cvt_13_normalize",
    "vit": "vit_normalize",
    "swin": "swin_normalize",
    "resnet": "resnet50_normalize",
}

# (tag, extra CLI flags, extra env) per precision config.  The default row
# runs the CLI exactly as a user would (tri-state bf16/narrow_sm resolve to
# the shipping defaults in-process); f32 opts out of every flip.
CONFIGS = [
    ("f32", ["--no-bf16", "--no-narrow_sm"], {}),
    ("default", [], {}),
]
# CvT's default additionally includes the KV-resident fused attention
# kernel (models/cvt.py, CVT_KV_ATTENTION=0 opts out) — isolate it.
CVT_EXTRA = [("default_noKV", [], {"CVT_KV_ATTENTION": "0"})]

EVAL_RE = re.compile(r"eval \([0-9.]+s\): (\{.*\})")


def run_one(arch, tag, flags, env_extra, args, seed):
    group = f"pq_{arch}_{tag}_s{seed}"
    cmd = [
        sys.executable, "-m", "vit_reranking_tpu.cli.train_baseline",
        "--dataset", "synthetic",
        "--synthetic_classes", str(args.classes),
        "--synthetic_per_class", str(args.per_class),
        "--synthetic_size", "224",
        "--synthetic_sep", str(args.sep),
        "--synthetic_nuisance", str(args.nuisance),
        "--bs", str(args.bs),
        "--arch", ARCH_NAMES[arch],
        "--loss", "margin", "--batch_mining", "distance",
        "--n_epochs", str(args.epochs), "--evalevery", "2",
        "--max_patience", "99",
        "--seed", str(seed), "--lr", str(args.lr),
        "--save_path", f"/tmp/parity_quality/{group}",
        "--group", group,
    ] + flags
    env = {**os.environ, **env_extra}
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + ":" + REPO
    t0 = time.time()
    print(f"=== {time.strftime('%H:%M:%S')} {' '.join(cmd)} "
          f"env={env_extra} ===", flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stdout.write(proc.stderr[-4000:])
        print(f"--- exit {proc.returncode} ({time.time()-t0:.0f}s) ---",
              flush=True)
        return None
    evals = [ast.literal_eval(m.group(1))
             for m in EVAL_RE.finditer(proc.stdout)]
    print(f"--- exit 0 ({time.time()-t0:.0f}s, {len(evals)} evals) ---",
          flush=True)
    # single-tenant chip: give the TPU server time to fully release the
    # previous client before the next attaches (CLAUDE.md: a process
    # launched while the previous one is dying wedges at first compile;
    # a 45 s gap still wedged once in r5 — use the full 90)
    time.sleep(90)
    return evals


def fmt(ev):
    return (f"r1={ev['r1']:6.2f} rp={ev['rp']:6.2f} mapr={ev['mapr']:6.2f}"
            if ev else "FAILED")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arches", nargs="+",
                    default=["resnet", "cvt", "vit", "swin"])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--classes", type=int, default=64)
    ap.add_argument("--per_class", type=int, default=8)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--sep", type=float, default=0.9)
    ap.add_argument("--nuisance", type=float, default=0.5)
    ap.add_argument("--seeds", nargs="+", type=int, default=[0])
    ap.add_argument("--tune", action="store_true",
                    help="resnet-only sweep over sep values")
    args = ap.parse_args()

    if args.tune:
        for nui in (0.6, 0.5, 0.4):
            a = argparse.Namespace(**{**vars(args), "nuisance": nui})
            evs = run_one("resnet", f"tune{nui}", [], {}, a, 0)
            print(f"nuisance={nui}: "
                  + " | ".join(fmt(e) for e in (evs or [])), flush=True)
        return

    results = {}
    for arch in args.arches:
        configs = CONFIGS + (CVT_EXTRA if arch == "cvt" else [])
        for tag, flags, env_extra in configs:
            for seed in args.seeds:
                evs = run_one(arch, tag, flags, env_extra, args, seed)
                results[(arch, tag, seed)] = evs

    print("\n===== parity table (per-epoch R@1/RP/MAP@R, hard synthetic "
          f"{args.classes}x{args.per_class} sep={args.sep}) =====")
    for (arch, tag, seed), evs in results.items():
        if not evs:
            print(f"{arch:8s} {tag:14s} s{seed}: FAILED")
            continue
        line = " | ".join(fmt(e) for e in evs)
        print(f"{arch:8s} {tag:14s} s{seed}: {line}")
    def tail_mean(evs, k="r1", n=3):
        vals = [e[k] for e in evs[-n:]]
        return sum(vals) / len(vals)

    print("\nlast-3-eval-mean deltas vs f32 (positive = default better; "
          "flag beyond the +-5 epoch-swing band):")
    for arch in args.arches:
        for seed in args.seeds:
            base = results.get((arch, "f32", seed))
            if not base:
                continue
            for tag in [c[0] for c in (CONFIGS + (CVT_EXTRA if arch == "cvt"
                                                  else []))][1:]:
                other = results.get((arch, tag, seed))
                if not other:
                    continue
                d = {k: tail_mean(other, k) - tail_mean(base, k)
                     for k in base[-1]}
                flag = " <-- REVIEW" if abs(d["r1"]) > 5.0 else ""
                print(f"  {arch:8s} {tag:14s} s{seed}: "
                      + " ".join(f"d{k}={v:+.2f}" for k, v in d.items())
                      + flag)


if __name__ == "__main__":
    main()
