"""Attribute the Swin-T train-step cost (RESULTS.md round 4: 83.5 ms/step
bf16+narrow_sm at bs=64/224px = 10.8% MFU, vs DeiT-S 24.8 ms at nearly the
same FLOPs — ~3x is overhead somewhere in the windowing machinery).

Each case compiles the FULL backbone fwd+bwd (sum-squares loss) at the
canonical shapes; garbage math is fine, the point is isolating cost:
  base     unmodified SwinNetwork
  nopart   window_partition/window_reverse as reshape-ONLY (no transpose):
           same shapes + FLOPs, wrong tokens — isolates the 6D transpose
           relayout both directions x 12 blocks
  noroll   jnp.roll as identity — isolates the shifted-window roll
           relayouts (6 shifted blocks x 2 rolls x fwd+bwd)
  nobias   skip the relative-position-bias gather+transpose+add (and its
           scatter-add backward) — isolates the per-block bias plumbing
  noattn   skip score/softmax/value einsums entirely (out = q tokens);
           qkv+proj Denses and partition/reverse stay live — isolates the
           small-window attention math (T=49 pads to 128 lanes on the MXU)
  bf16ln   LayerNorms in bf16 instead of the pinned-f32 + cast recipe —
           isolates the 25 f32 LN + astype round trips
  kernel   window-resident fused attention (ops/swin_attention_pallas.py):
           probs stay in VMEM, bias grad emitted in-kernel
  qslice   XLA layout reformulation: q/k/v as (Bw, T, h, hd) slices of the
           qkv tensor (no 5D transpose), einsums 'bthd,bshd->bhts' and
           'bhts,bshd->bthd' (no output transpose) — same math, different
           operand layouts

Usage: python scripts/ablate_swin_cost.py [--bs 64] [--cases base nopart ...]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="1-block/stage, dim 24 — CPU harness check only")
    ap.add_argument("--fwd_only", action="store_true",
                    help="time the forward alone (separates fwd/bwd effects)")
    ap.add_argument("--min_windows", type=int, default=None,
                    help="override SWIN_KERNEL_MIN_WINDOWS for kernel cases "
                         "(16 = stages 0/1 only at 224px)")
    ap.add_argument(
        "--cases", nargs="+",
        default=["base", "nopart", "noroll", "nobias", "noattn", "bf16ln"],
    )
    args = ap.parse_args()

    from vit_reranking_tpu.models import swin as swin_mod

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.bs, args.size, args.size, 3)).astype(np.float32)
    )

    import flax.linen as nn

    orig = dict(
        part=swin_mod.window_partition,
        rev=swin_mod.window_reverse,
        attn_call=swin_mod.WindowAttention.__call__,
        roll=jnp.roll,
        ln_call=nn.LayerNorm.__call__,
    )

    def run_case(name):
        swin_mod.window_partition = orig["part"]
        swin_mod.window_reverse = orig["rev"]
        swin_mod.WindowAttention.__call__ = orig["attn_call"]
        jnp.roll = orig["roll"]
        nn.LayerNorm.__call__ = orig["ln_call"]
        # force the kernel switch per case (independent of the module default)
        swin_mod.USE_SWIN_WINDOW_KERNEL = name == "kernel"
        if name == "kernel" and args.min_windows is not None:
            import vit_reranking_tpu.ops.swin_attention_pallas as swa

            swa.SWIN_KERNEL_MIN_WINDOWS = args.min_windows

        if name == "nopart":
            swin_mod.window_partition = lambda t, w: t.reshape(
                -1, w * w, t.shape[-1]
            )
            swin_mod.window_reverse = lambda wins, w, H, W: wins.reshape(
                -1, H, W, wins.shape[-1]
            )
        elif name == "noroll":
            jnp.roll = lambda t, shift=None, axis=None: t
        elif name == "nobias":

            def attn_nobias(self, xx, mask=None, train=False, n_windows=1):
                Bw, T, C = xx.shape
                hd = self.dim // self.num_heads
                qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                               name="qkv")(xx)
                qkv = qkv.reshape(Bw, T, 3, self.num_heads, hd).transpose(
                    2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                narrow = self.narrow_sm and self.dtype != jnp.float32
                attn = jnp.einsum(
                    "bhtd,bhsd->bhts", q, k,
                    preferred_element_type=None if narrow else jnp.float32,
                ) * hd**-0.5
                if mask is not None:
                    nW = mask.shape[0]
                    attn = attn.reshape(Bw // nW, nW, self.num_heads, T, T)
                    attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
                    attn = attn.reshape(Bw, self.num_heads, T, T)
                attn = jax.nn.softmax(attn, axis=-1)
                out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
                out = out.transpose(0, 2, 1, 3).reshape(Bw, T, self.dim)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

            swin_mod.WindowAttention.__call__ = nn.compact(attn_nobias)
        elif name == "noattn":

            def attn_skip(self, xx, mask=None, train=False, n_windows=1):
                Bw, T, C = xx.shape
                hd = self.dim // self.num_heads
                qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                               name="qkv")(xx)
                qkv = qkv.reshape(Bw, T, 3, self.num_heads, hd).transpose(
                    2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                # keep k/v live so their Dense slices aren't DCE'd
                out = q + 0.0 * (jnp.mean(k) + jnp.mean(v))
                out = out.transpose(0, 2, 1, 3).reshape(Bw, T, self.dim)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

            swin_mod.WindowAttention.__call__ = nn.compact(attn_skip)
        elif name == "qslice":

            def attn_qslice(self, xx, mask=None, train=False, n_windows=1):
                from vit_reranking_tpu.models.common import trunc_normal_init

                Bw, T, C = xx.shape
                hd = self.dim // self.num_heads
                qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                               name="qkv")(xx)
                qkv = qkv.reshape(Bw, T, 3, self.num_heads, hd)
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                narrow = self.narrow_sm and self.dtype != jnp.float32
                attn = jnp.einsum(
                    "bthd,bshd->bhts", q, k,
                    preferred_element_type=None if narrow else jnp.float32,
                ) * hd**-0.5
                # constant table: self.param is rejected in late-bound
                # methods; gather+transpose+add cost is identical, only the
                # tiny (169, h) table grad disappears
                table = jnp.ones(
                    ((2 * self.window - 1) ** 2, self.num_heads), jnp.float32
                )
                idx = jnp.asarray(swin_mod._relative_position_index(self.window))
                bias = table[idx.reshape(-1)].reshape(T, T, self.num_heads)
                attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
                if mask is not None:
                    nW = mask.shape[0]
                    attn = attn.reshape(Bw // nW, nW, self.num_heads, T, T)
                    attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
                    attn = attn.reshape(Bw, self.num_heads, T, T)
                attn = jax.nn.softmax(attn, axis=-1)
                out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
                out = out.reshape(Bw, T, self.dim)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

            swin_mod.WindowAttention.__call__ = nn.compact(attn_qslice)
        elif name == "bf16ln":
            _ln = orig["ln_call"]

            def ln_bf16(self, t, *a, **kw):
                if self.dtype == jnp.float32 and t.dtype == jnp.bfloat16:
                    object.__setattr__(self, "dtype", jnp.bfloat16)
                return _ln(self, t, *a, **kw)

            nn.LayerNorm.__call__ = ln_bf16

        try:
            kw = dict(depths=(1, 1, 1, 1), dim=24) if args.tiny else {}
            model = swin_mod.SwinNetwork(
                embed_dim=128, narrow_sm=dtype != jnp.float32, dtype=dtype, **kw
            )
            v = model.init({"params": key}, x[:2], train=False)

            def loss_fn(p, xx):
                out, _, _ = model.apply(
                    {"params": p}, xx, train=True,
                    rngs={"dropout": key, "droppath": key},
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            if args.fwd_only:
                fwd_bwd = jax.jit(loss_fn)
                tag = "fwd"
            else:
                tag = "fwd+bwd"

                @jax.jit
                def fwd_bwd(params, xx):
                    loss, grads = jax.value_and_grad(loss_fn)(params, xx)
                    return loss + sum(
                        jnp.sum(g.astype(jnp.float32) ** 2)
                        for g in jax.tree.leaves(grads)
                    )

            t0 = time.time()
            np.asarray(fwd_bwd(v["params"], x))
            tc = time.time() - t0
            t = timed(fwd_bwd, v["params"], x, reps=args.reps)
            print(f"{name}: {t*1e3:.1f} ms {tag} (compile {tc:.0f}s)",
                  flush=True)
        finally:
            swin_mod.window_partition = orig["part"]
            swin_mod.window_reverse = orig["rev"]
            swin_mod.WindowAttention.__call__ = orig["attn_call"]
            jnp.roll = orig["roll"]
            nn.LayerNorm.__call__ = orig["ln_call"]

    for name in args.cases:
        run_case(name)


if __name__ == "__main__":
    main()
