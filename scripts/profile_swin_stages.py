"""Quantitative per-stage / per-op attribution of the Swin-T train-step cost
(VERDICT r4 item 1: do for Swin what r4 did for CvT — a bytes/FLOPs closure).

Context (RESULTS.md r4): Swin-T full step 83.5 ms at bs=64 (10.8% MFU) vs
DeiT-S 24.8 ms (36.6%) at near-equal FLOPs; attention ~33 ms of the fwd+bwd,
and with attention ablated away the remaining forward ALONE is 44.5 ms.
The usual suspects (partition transposes, rolls, bias, f32 LNs) all measured
neutral qualitatively — this script produces the numbers: where the bytes
and FLOPs are per stage, what each sub-op costs, and whether the flat-proj
reformulation (models/swin.py::USE_SWIN_FLAT_PROJ — qkv/proj Denses on the
unpadded flat (B, L, C) rows instead of the 49->64-sublane-padded windowed
layout) buys a measured win.

Parts (all timings on the REAL chip; AOT-compile once per program, time the
second call, host-force every rep — CLAUDE.md axon rules):
  flat    full-backbone fwd+bwd A/B: base vs flat_proj (the candidate fix)
  prefix  truncated models (patch embed, +stage0, ..., full): timing +
          XLA cost_analysis flops/"bytes accessed"; successive diffs =
          per-stage cost -> the closure table
  ops     chained-scan sub-op benches at stage geometries (LN, qkv windowed
          vs flat, proj windowed vs flat, partition/roll round trips, MLP,
          patch-merge), fwd+bwd
  batch   base model at bs 32/64/128 (overhead amortization check)

Usage: python scripts/profile_swin_stages.py [--parts flat prefix ops batch]
       [--bs 64] [--f32] [--reps 5]

Reference match: architectures/swin.py:43-61 (swin_tiny topology),
scripts/diml/test_diml_swin.sh:342-344 (canonical benchmark config #4).
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def aot(fn, *args):
    """Compile ONCE (AOT) and return (compiled, compile_seconds, cost_dict)."""
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    tc = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        cost = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        cost = {"flops": 0.0, "bytes": 0.0}
    return compiled, tc, cost


def timed(compiled, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = compiled(*args)
        np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


def fwd_bwd_fn(model, key):
    def fn(params, xx):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, xx, train=True,
                rngs={"dropout": key, "droppath": key},
            )
            leaf = out[0] if isinstance(out, tuple) else out
            return jnp.sum(leaf.astype(jnp.float32) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(
            jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)
        )

    return fn


# ---------------------------------------------------------------------------
# prefix part: truncated backbones
# ---------------------------------------------------------------------------


def make_prefix(n_stages, dtype, narrow_sm):
    from vit_reranking_tpu.models import swin as sm

    class SwinPrefix(nn.Module):
        """SwinNetwork truncated after `n_stages` stages (0 = patch embed
        only); mirrors models/swin.py::SwinNetwork.__call__ exactly."""

        @nn.compact
        def __call__(self, x, train=False):
            depths, heads, dim0, window = (2, 2, 6, 2), (3, 6, 12, 24), 96, 7
            B = x.shape[0]
            x = x.astype(dtype)
            x = nn.Conv(dim0, (4, 4), strides=(4, 4), dtype=dtype,
                        name="patch_embed_proj")(x)
            _, H, W, _ = x.shape
            x = x.reshape(B, H * W, dim0)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="patch_embed_norm")(x)
            x = x.astype(dtype)
            total = sum(depths)
            dpr = np.linspace(0, 0.2, total)
            b = 0
            dim = dim0
            for li in range(n_stages):
                for bi in range(depths[li]):
                    x = sm.SwinBlock(
                        dim, heads[li], window=window,
                        shift=0 if bi % 2 == 0 else window // 2,
                        drop_path=float(dpr[b]), narrow_sm=narrow_sm,
                        dtype=dtype, name=f"layer{li}_block{bi}",
                    )(x, H, W, train)
                    b += 1
                if li < 3:
                    x = sm.PatchMerging(dim, dtype=dtype,
                                        name=f"layer{li}_downsample")(x, H, W)
                    H, W, dim = H // 2, W // 2, dim * 2
            if n_stages == 4:
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
            return x

    return SwinPrefix()


def run_prefix(args, x, key):
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rows = []
    for k in range(5):
        model = make_prefix(k, dtype, not args.f32)
        v = model.init({"params": key}, x[:2], train=False)
        compiled, tc, cost = aot(fwd_bwd_fn(model, key), v["params"], x)
        t = timed(compiled, v["params"], x, reps=args.reps)
        rows.append((k, t, cost["flops"], cost["bytes"]))
        print(f"prefix k={k}: {t*1e3:7.1f} ms fwd+bwd  "
              f"flops {cost['flops']/1e9:8.1f} G  bytes {cost['bytes']/1e9:6.2f} GB "
              f"(compile {tc:.0f}s)", flush=True)
    names = ["patch_embed", "stage0(2blk,C96,L3136)", "stage1(2blk,C192,L784)",
             "stage2(6blk,C384,L196)", "stage3(2blk,C768,L49)+norm"]
    print("\nper-stage diffs (fwd+bwd):")
    print(f"{'component':<28}{'ms':>8}{'GFLOP':>9}{'GB':>7}{'TFLOP/s':>9}"
          f"{'GB/s':>7}{'%peakBW':>9}")
    prev = (0, 0.0, 0.0, 0.0)
    for (k, t, f, by), name in zip(rows, names):
        dt, df, dby = t - prev[1], f - prev[2], by - prev[3]
        if k == 0:
            dt, df, dby = t, f, by
        tflops = df / dt / 1e12 if dt > 0 else 0
        gbps = dby / dt / 1e9 if dt > 0 else 0
        print(f"{name:<28}{dt*1e3:8.1f}{df/1e9:9.1f}{dby/1e9:7.2f}"
              f"{tflops:9.1f}{gbps:7.0f}{gbps/819*100:8.0f}%", flush=True)
        prev = (k, t, f, by)


# ---------------------------------------------------------------------------
# ops part: chained-scan sub-op benches
# ---------------------------------------------------------------------------


def chain_bwd(fn, reps):
    """fwd+bwd of `fn` chained `reps` times inside one program.  The carry is
    c + eps*grad (grad has c's shape for ANY fn output shape; eps is a traced
    runtime scalar so nothing folds/DCEs, and the carry magnitude stays ~c
    instead of exploding like a pure-grad chain would).  The axpy adds ~3
    c-sized HBM touches per step — identical across compared cases."""

    def step(c, _, eps):
        g = jax.grad(lambda cc: jnp.sum(fn(cc).astype(jnp.float32) ** 2))(c)
        return c + eps.astype(c.dtype) * g.astype(c.dtype), ()

    def run(c, eps):
        c, _ = jax.lax.scan(lambda cc, xx: step(cc, xx, eps), c, None,
                            length=reps)
        return jnp.sum(c.astype(jnp.float32))

    return run


def run_ops(args, key):
    from vit_reranking_tpu.models import swin as sm
    from vit_reranking_tpu.models.common import Mlp

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    B, reps = args.bs, 24
    rng = np.random.default_rng(0)

    def dense_case(rows, cin, cout, label):
        d = nn.Dense(cout, dtype=dtype)
        xx = jnp.asarray(rng.standard_normal((rows[0], rows[1], cin)), dtype)
        v = d.init(key, xx[:1])
        return label, lambda c: d.apply(v, c), xx

    def ln_case(shape, label):
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        xx = jnp.asarray(rng.standard_normal(shape), dtype)
        v = ln.init(key, xx[:1])
        return label, lambda c: ln.apply(v, c).astype(dtype), xx

    def mlp_case(L, C, label):
        m = Mlp(4 * C, C, act=lambda t: nn.gelu(t, approximate=False),
                dtype=dtype)
        xx = jnp.asarray(rng.standard_normal((B, L, C)), dtype)
        v = m.init(key, xx[:1])
        return label, lambda c: m.apply(v, c), xx

    def merge_case(H, C, label):
        pm = sm.PatchMerging(C, dtype=dtype)
        xx = jnp.asarray(rng.standard_normal((B, H * H, C)), dtype)
        v = pm.init(key, xx[:1], H, H)
        return label, lambda c: pm.apply(v, c, H, H), xx

    # relu between the two halves blocks XLA's transpose-cancellation (a bare
    # reverse(partition(x)) is the identity and would fold away); the measured
    # number is 2 partitions + 2 reverses per rep across fwd+bwd = 2x the
    # per-block in-model cost.
    def part_case(H, C, label):
        xx = jnp.asarray(rng.standard_normal((B, H, H, C)), dtype)
        return label, lambda c: sm.window_reverse(
            nn.relu(sm.window_partition(c, 7)), 7, H, H), xx

    def roll_case(H, C, label):
        xx = jnp.asarray(rng.standard_normal((B, H, H, C)), dtype)
        return label, lambda c: jnp.roll(
            nn.relu(jnp.roll(c, (-3, -3), (1, 2))), (3, 3), (1, 2)), xx

    cases = [
        # --- stage-0 geometry: L=3136, C=96, nW=64, T=49 ---
        ln_case((B, 3136, 96), "s0_ln_f32(B,3136,96)"),
        dense_case((B * 64, 49), 96, 288, "s0_qkv_win(4096,49,96->288)"),
        dense_case((B, 3136), 96, 288, "s0_qkv_flat(64,3136,96->288)"),
        dense_case((B * 64, 49), 96, 96, "s0_proj_win(4096,49,96->96)"),
        dense_case((B, 3136), 96, 96, "s0_proj_flat(64,3136,96->96)"),
        part_case(56, 96, "s0_partition_rt(56px,C96)"),
        roll_case(56, 96, "s0_roll_rt(56px,C96)"),
        mlp_case(3136, 96, "s0_mlp(3136,96)"),
        merge_case(56, 96, "s0_merge(56->28,C96)"),
        # --- stage-2 geometry: L=196, C=384, nW=4, T=49 ---
        dense_case((B * 4, 49), 384, 1152, "s2_qkv_win(256,49,384->1152)"),
        dense_case((B, 196), 384, 1152, "s2_qkv_flat(64,196,384->1152)"),
        dense_case((B * 4, 49), 384, 384, "s2_proj_win(256,49,384->384)"),
        dense_case((B, 196), 384, 384, "s2_proj_flat(64,196,384->384)"),
        mlp_case(196, 384, "s2_mlp(196,384)"),
        ln_case((B, 196, 384), "s2_ln_f32(B,196,384)"),
    ]
    eps = jnp.float32(1e-6)
    # RTT floor: a near-empty program's wall is the dispatch round trip this
    # host pays per timed call; subtract it before dividing by the chain reps
    tiny = jnp.zeros((8, 128), jnp.float32)
    rtt_c, _, _ = aot(lambda c: jnp.sum(c) * eps, tiny)
    rtt = timed(rtt_c, tiny, reps=3, warmup=2)
    print(f"(dispatch RTT floor: {rtt*1e3:.1f} ms — subtracted per call)",
          flush=True)

    print(f"\nsub-op fwd+bwd (chained x{reps} in one program, per-rep ms; "
          f"x12-blocks-equivalent in parens where it applies):", flush=True)
    for label, fn, xx in cases:
        run = chain_bwd(fn, reps)
        compiled, tc, _ = aot(run, xx, eps)
        t = max(timed(compiled, xx, eps, reps=2, warmup=1) - rtt, 0.0) / reps
        print(f"  {label:<36} {t*1e3:7.3f} ms  (x12 = {t*12*1e3:6.1f} ms; "
              f"compile {tc:.0f}s)", flush=True)


# ---------------------------------------------------------------------------
# attn part: isolated attention-core benches (the unexplained stage cost)
# ---------------------------------------------------------------------------
#
# The prefix closure leaves ~14 ms/block at stage 0 unattributed after the
# measured sub-ops — the windowed attention core (einsum+bias+softmax+einsum
# at (B*nW, H, 49, hd=32)) is the suspect.  Every operand lane-pads badly on
# the (8/16, 128) tiled layouts: hd=32 -> 128 lanes (4x), T=49 -> 128 lanes
# (2.6x) on the score/prob tensors.  Variants probe whether a layout
# reformulation escapes the padding:
#   core      model layout 'bhtd' (bias+softmax, narrow bf16)
#   mask      + shifted-window mask add
#   dT        d-on-sublane: q/k as 'bhdt/bhds' (lane dim = T)
#   hbatch    heads folded into the batch dim: (Bw*H, T, d)
#   f32s      scores pinned f32 (the non-narrow_sm path)


def attn_core_case(rng, Bw, H, T, D, dtype, label, mode="core",
                   with_mask=False, nW=16):
    bias = jnp.asarray(rng.standard_normal((H, T, T)), jnp.float32)
    mask = None
    if with_mask:
        m = rng.integers(0, 2, size=(nW, T, 1))
        mask = jnp.asarray(
            np.where(m == m.transpose(0, 2, 1), 0.0, -100.0), jnp.float32)
    scale = D ** -0.5
    # generate the ~115 MB qkv operand ON DEVICE — an eager host transfer
    # here costs ~2.5 s/case on the 50 MB/s tunnel (first run of this part
    # spent 18 min shipping cases before the first compile)
    qkv = jax.jit(
        lambda key: jax.random.normal(key, (3, Bw, H, T, D), dtype)
    )(jax.random.PRNGKey(int(rng.integers(1 << 30))))

    def fn(c):
        q, k, v = c[0], c[1], c[2]
        if mode == "dT":
            qT = q.transpose(0, 1, 3, 2)  # (Bw, H, D, T)
            kT = k.transpose(0, 1, 3, 2)
            attn = jnp.einsum("bhdt,bhds->bhts", qT, kT) * scale
        elif mode == "hbatch":
            qf = q.reshape(Bw * H, T, D)
            kf = k.reshape(Bw * H, T, D)
            attn = (jnp.einsum("btd,bsd->bts", qf, kf) * scale).reshape(
                Bw, H, T, T)
        else:
            pet = jnp.float32 if mode == "f32s" else None
            attn = jnp.einsum("bhtd,bhsd->bhts", q, k,
                              preferred_element_type=pet) * scale
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            attn = attn.reshape(Bw // nW, nW, H, T, T)
            attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(Bw, H, T, T)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)

    return label, fn, qkv


def run_attn(args, key):
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    B, reps = args.bs, 24
    rng = np.random.default_rng(0)
    eps = jnp.float32(1e-6)
    tiny = jnp.zeros((8, 128), jnp.float32)
    rtt_c, _, _ = aot(lambda c: jnp.sum(c) * eps, tiny)
    rtt = timed(rtt_c, tiny, reps=3, warmup=2)
    print(f"(dispatch RTT floor: {rtt*1e3:.1f} ms — subtracted per call)",
          flush=True)

    geos = [("s0", B * 64, 3, 64), ("s1", B * 16, 6, 16),
            ("s2", B * 4, 12, 4), ("s3", B, 24, 1)]
    cases = []
    for tag, Bw, H, nW in geos:
        cases.append(attn_core_case(rng, Bw, H, 49, 32, dtype,
                                    f"{tag}_attn_core({Bw},{H},49,32)"))
        if nW > 1:
            cases.append(attn_core_case(
                rng, Bw, H, 49, 32, dtype,
                f"{tag}_attn_mask({Bw},{H},49,32)", with_mask=True, nW=nW))
    for mode in ("dT", "hbatch", "f32s"):
        cases.append(attn_core_case(rng, B * 64, 3, 49, 32, dtype,
                                    f"s0_attn_{mode}(4096,3,49,32)",
                                    mode=mode))
    print(f"\nattention-core fwd+bwd (chained x{reps}, per-rep ms; "
          "x-blocks-equivalent shown per stage depth):", flush=True)
    for label, fn, xx in cases:
        run = chain_bwd(fn, reps)
        compiled, tc, _ = aot(run, xx, eps)
        t = max(timed(compiled, xx, eps, reps=2, warmup=1) - rtt, 0.0) / reps
        print(f"  {label:<38} {t*1e3:7.3f} ms  (compile {tc:.0f}s)",
              flush=True)


# ---------------------------------------------------------------------------
# flat / batch parts: full-backbone A/B
# ---------------------------------------------------------------------------


def full_model(narrow_sm, dtype):
    from vit_reranking_tpu.models import swin as sm

    return sm.SwinNetwork(embed_dim=128, narrow_sm=narrow_sm, dtype=dtype)


def run_full_case(args, x, key, label):
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = full_model(not args.f32, dtype)
    v = model.init({"params": key}, x[:2], train=False)
    compiled, tc, cost = aot(fwd_bwd_fn(model, key), v["params"], x)
    t = timed(compiled, v["params"], x, reps=args.reps)
    print(f"{label}: {t*1e3:.1f} ms fwd+bwd  flops {cost['flops']/1e12:.2f} T "
          f"({cost['flops']/t/1e12:.1f} TFLOP/s)  bytes {cost['bytes']/1e9:.2f} GB "
          f"({cost['bytes']/t/1e9:.0f} GB/s, {cost['bytes']/t/819e9*100:.0f}% peak) "
          f"(compile {tc:.0f}s)", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--parts", nargs="+",
                    default=["flat", "prefix", "ops", "batch"])
    args = ap.parse_args()

    from vit_reranking_tpu.models import swin as sm

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.bs, args.size, args.size, 3)).astype(np.float32)
    )

    import traceback

    def guarded(tag, thunk):
        try:
            thunk()
        except Exception:
            print(f"!! part {tag} failed:", flush=True)
            traceback.print_exc()

    if "remat" in args.parts:
        def _remat():
            print("=== remat A/B (full backbone fwd+bwd) ===", flush=True)
            for mode, label in (("0", "base (no remat)"),
                                ("dots", "remat dots_no_batch_saveable"),
                                ("1", "remat full (inputs only)")):
                sm.SWIN_REMAT = mode
                run_full_case(args, x, key, label)
            sm.SWIN_REMAT = "0"
        guarded("remat", _remat)
    if "flat" in args.parts:
        def _flat():
            print("=== flat-proj A/B (full backbone fwd+bwd) ===", flush=True)
            sm.USE_SWIN_FLAT_PROJ = False
            run_full_case(args, x, key, "base (windowed qkv/proj)")
            sm.USE_SWIN_FLAT_PROJ = True
            run_full_case(args, x, key, "flat_proj")
            sm.USE_SWIN_FLAT_PROJ = False
        guarded("flat", _flat)
    if "prefix" in args.parts:
        def _prefix():
            print("\n=== per-stage closure table (truncated prefixes) ===",
                  flush=True)
            run_prefix(args, x, key)
        guarded("prefix", _prefix)
    if "ops" in args.parts:
        def _ops():
            print("\n=== sub-op chained benches ===", flush=True)
            run_ops(args, key)
        guarded("ops", _ops)
    if "attn" in args.parts:
        def _attn():
            print("\n=== attention-core benches ===", flush=True)
            run_attn(args, key)
        guarded("attn", _attn)
    if "batch" in args.parts:
        def _batch():
            print("\n=== batch scaling (base) ===", flush=True)
            for bs in (32, 128):
                xb = jnp.asarray(rng.standard_normal(
                    (bs, args.size, args.size, 3)).astype(np.float32))
                t = run_full_case(
                    argparse.Namespace(**{**vars(args), "bs": bs}), xb, key,
                    f"base bs={bs}")
                print(f"  -> {t / bs * 1e3:.3f} ms/img", flush=True)
        guarded("batch", _batch)


if __name__ == "__main__":
    main()
