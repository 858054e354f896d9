"""Typed configuration mirroring the reference's argparse flags.

Flag names and defaults follow reference parameters.py:5-244 exactly, so the
reference's scripts/ run against this framework with a one-line device change
(BASELINE.json requirement).  The four reference parser groups
(basic_training / batch_creation / batchmining_specific / loss_specific) are
flattened into one dataclass; ``build_parser()`` regenerates an argparse
parser from the fields and ``Config.from_args`` parses a CLI line.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class Config:
    # ---- dataset (parameters.py:7-13)
    dataset: str = "cub200"
    use_tv_split: bool = False
    tv_split_by_samples: bool = False
    tv_split_perc: float = 0.8
    augmentation: str = "base"

    # ---- general training (parameters.py:16-40)
    lr: float = 0.00001
    fc_lr: float = -1.0
    decay: float = 0.0004
    n_epochs: int = 150
    eval_epochs: int = 1
    kernels: int = 6
    bs: int = 112
    seed: int = 1
    scheduler: str = "step"
    gamma: float = 0.3
    tau: List[int] = field(default_factory=lambda: [1000])
    resume_path: Optional[str] = None
    cachebatchsize: int = 20
    lrstep: int = 20
    lrgamma: float = 0.5
    weightdecay: float = 0.001
    momentum: float = 0.9
    patience: int = 10
    margin: float = 0.1
    nNeg: int = 5
    imageresizew: int = 640
    imageresizeh: int = 480
    start_epoch: int = 0
    evalevery: int = 10
    max_patience: int = 100

    # ---- loss / mining (parameters.py:43-45)
    optim: str = "adam"
    loss: str = "margin"
    batch_mining: str = "distance"

    # ---- network (parameters.py:48-52)
    num_classes: int = 1000
    embed_dim: int = 128
    not_pretrained: bool = False
    arch: str = "resnet50_frozen_normalize"

    # ---- evaluation (parameters.py:55-63)
    no_train_metrics: bool = False
    evaluate_on_gpu: bool = False
    evaluation_metrics: List[str] = field(
        default_factory=lambda: ["e_recall@1", "e_recall@2", "e_recall@4", "nmi", "f1"]
    )
    storage_metrics: List[str] = field(default_factory=lambda: ["e_recall@1"])
    evaltypes: List[str] = field(default_factory=lambda: ["discriminative"])

    # ---- setup (parameters.py:67-70)
    savename: str = "group_plus_seed"
    source_path: str = os.getcwd() + "/data"
    save_path: str = os.getcwd() + "/Training_Results"
    group: str = "default"

    # ---- ViT / DIML evaluation (parameters.py:73-120)
    blk_ind: int = 0
    cross_attn_depth: int = 1
    skip_last_vit_norm: bool = False
    use_pretrained: bool = False
    cat_global: bool = False
    warmup_epoch: int = 30
    grid_size: int = 7
    use_cls_token: bool = False
    use_uniform: bool = False
    use_inverse: bool = False
    use_minus: bool = False
    use_soft: bool = False
    use_rollout: bool = False
    use_ot: bool = False
    use_relu: bool = False
    training: bool = False
    shuffle: bool = False
    temperature: float = 0.1
    ot_part: float = 1.0
    to_submit: bool = False
    plot_topk: int = 1
    task_loss: str = "triplet"
    distill: Optional[str] = None
    distill_hardneg: bool = False
    rand_distill: bool = False
    kd_weight: float = 1.0
    rkd_distance_weight: float = 1.0
    rkd_angle_weight: float = 1.0
    tl_weight: float = 1.0
    supcon_temp: float = 0.1
    rand_triplets: bool = False
    is_parallel: bool = False
    save_freq: int = 100
    vis_freq: int = 1
    debug: bool = False

    # ---- MSLS sequence tasks (training_tools/msls.py:76-133; the reference
    # hardcodes im2im/seq_length=1 at its call sites — exposed here as flags)
    msls_task: str = "im2im"
    msls_seq_length: int = 1
    msls_subtask: str = "all"
    # SyntheticMSLS render size (tests/smoke default 64; benchmarks raise it
    # to make the input-pipeline cost realistic)
    msls_image_size: int = 64

    # ---- NetVLAD (parameters.py:123-135)
    mini_data: bool = False
    vlad_ckpt: str = ""
    pooling: str = "patchnetvlad"
    num_clusters: int = 64
    patch_sizes: str = "5"
    strides: str = "0"
    append_pca_layer: bool = False
    vladv2: bool = False
    num_pcs: int = 4096
    # reference default is tempfile.mkdtemp() — a fresh dir per run, i.e. no
    # reuse; empty string here means caching off
    cache_path: str = ""
    save_every_epoch: bool = False
    # step-granular periodic checkpointing for long epochs (SOP: 1000+
    # steps/epoch) — 0 disables; N > 0 refreshes `latest` every N optimizer
    # steps so a preempted TPU job loses at most N steps of model/optimizer
    # progress (resume restarts the interrupted epoch).  SURVEY section 5
    # failure-recovery row; no reference equivalent (torch saves per epoch,
    # utilities/misc.py:42-69).
    checkpoint_every_steps: int = 0

    # ---- XBM (parameters.py:138-141)
    enable_xbm: bool = False
    xbm_start_iteration: int = 1000
    xbm_size: int = 10000
    xbm_weight: float = 1.0

    # ---- loss-specific (parameters.py:147-211)
    loss_contrastive_pos_margin: float = 0.0
    loss_contrastive_neg_margin: float = 1.0
    loss_triplet_margin: float = 0.2
    loss_margin_margin: float = 0.2
    loss_margin_beta_lr: float = 0.0005
    loss_margin_beta: float = 1.2
    loss_margin_nu: float = 0.0
    loss_margin_beta_constant: bool = False
    loss_proxynca_lrmulti: float = 50.0
    loss_npair_l2: float = 0.005
    loss_angular_alpha: float = 45.0
    loss_angular_npair_ang_weight: float = 2.0
    loss_angular_npair_l2: float = 0.005
    loss_multisimilarity_pos_weight: float = 2.0
    loss_multisimilarity_neg_weight: float = 40.0
    loss_multisimilarity_margin: float = 0.1
    loss_multisimilarity_thresh: float = 0.5
    loss_lifted_neg_margin: float = 1.0
    loss_lifted_l2: float = 0.005
    loss_quadruplet_margin_alpha_1: float = 0.2
    loss_quadruplet_margin_alpha_2: float = 0.2
    loss_softtriplet_n_centroids: int = 2
    loss_softtriplet_margin_delta: float = 0.01
    loss_softtriplet_gamma: float = 0.1
    loss_softtriplet_lambda: float = 8.0
    loss_softtriplet_reg_weight: float = 0.2
    loss_softtriplet_lrmulti: float = 1.0
    loss_softmax_lr: float = 0.00001
    loss_softmax_temperature: float = 0.05
    loss_histogram_nbins: int = 65
    loss_snr_margin: float = 0.2
    loss_snr_reg_lambda: float = 0.005
    loss_arcface_lr: float = 0.0005
    loss_arcface_angular_margin: float = 0.5
    loss_arcface_feature_scale: float = 16.0

    # ---- batch mining specific (parameters.py:216-224)
    miner_distance_lower_cutoff: float = 0.5
    miner_distance_upper_cutoff: float = 1.4
    miner_rho_distance_lower_cutoff: float = 0.5
    miner_rho_distance_upper_cutoff: float = 1.4
    miner_rho_distance_cp: float = 0.2

    # ---- batch creation (parameters.py:228-243)
    data_sampler: str = "class_random"
    samples_per_class: int = 2
    # AdvancedSampler subset fraction (reference datasampler/samplers.py:10,
    # --primary_subset_perc)
    primary_subset_perc: float = 0.1
    data_batchmatch_bigbs: int = 512
    data_batchmatch_ncomps: int = 10
    data_storage_no_update: bool = False
    data_d2_coreset_lambda: float = 1.0
    data_gc_coreset_lim: float = 1e-9
    data_sampler_lowproj_dim: int = -1
    data_sim_measure: str = "euclidean"
    data_gc_softened: bool = False
    data_idx_full_prec: bool = False
    data_mb_mom: float = -1.0
    data_mb_lr: float = 1.0

    # ---- TPU-framework additions (not in the reference)
    n_classes: int = 0  # filled in by the dataset
    synthetic_classes: int = 8
    synthetic_per_class: int = 16
    synthetic_size: int = 224
    # class-prototype separation / pixel-noise amplitude for the synthetic
    # dataset.  sep=1.0 = legacy saturating protocol; sep<1 shrinks classes
    # toward a shared prototype + adds a gain/shift nuisance so retrieval
    # metrics land mid-range and can discriminate precision recipes
    # (data/datasets.py::SyntheticDataset, VERDICT r4 item 3)
    synthetic_sep: float = 1.0
    synthetic_noise: float = 0.35
    # gain/shift nuisance amplitude scale (active when sep != 1.0).  The
    # full-strength nuisance (1.0) cliffs from-scratch training straight to
    # ~chance at ANY sep in a short step budget; ~0.5 lands the mid-range
    # operating point the quality-parity runs use.
    synthetic_nuisance: float = 1.0
    use_qk: bool = False  # ViT attention-marginal rerank (eval_attn_diml path)
    # dormant reference variants, exposed behind flags (VERDICT r2 item 9):
    # per-head OT with max-over-heads scoring (utilities/diml.py:424-472 —
    # only a stale eval_mha_diml.pyc suggests it ever ran) ...
    use_mh: bool = False
    mh_heads: int = 12
    # ... and the OT-weighted pairwise-L2 eval scoring (utilities/diml.py:
    # 149-203, defined but never called in the reference)
    use_dist: bool = False
    # Grad-CAM OT marginals (eval_attn_diml.py:111-158 hardcodes use_cam;
    # exposed as a flag; CAM source model per utilities/cam.py:69-86)
    use_cam: bool = False
    cam_ckpt: str = ""  # optional torch resnet50 state for the CAM source
    remat: bool = False  # rematerialize CvT blocks (activation memory <-> FLOPs)
    device_batch: bool = True  # shard batches over the data mesh axis
    mesh_shape: Optional[str] = None  # e.g. "data:8" or "data:4,model:2"
    # bf16 activation compute in the backbone.  Tri-state: None = per-context
    # default — the CvT TRAINING CLIs flip it on (96.7 -> 69.8 ms/step on the
    # v5e at the canonical recipe, loss parity to 3 decimals; measured by
    # scripts/profile_train_step.py); eval and other archs stay f32
    # (DeiT measured -4% from the casts around its f32 LayerNorms).
    bf16: Optional[bool] = None
    # narrow attention softmax: let CvT attention scores/probs follow the
    # compute dtype instead of pinning f32 (models/cvt.py::CvTAttention
    # .narrow_sm).  Tri-state like bf16: None = follow bf16 in the CvT
    # training CLIs (69.8 -> 61.8 ms/step at the canonical recipe, loss
    # parity; measured by scripts/profile_train_step.py --bf16sm); inert
    # for f32, eval rollout paths, and other archs.
    narrow_sm: Optional[bool] = None
    # stage-0 retrieval via TPU approx_max_k per gallery block (~2.4x at SOP
    # scale, empirical recall 1.0 at target 0.99); default exact = faiss parity
    approx_topk: bool = False
    # stream the fused rerank kernel's packed similarity through HBM in bf16
    # (the kernel is byte-bound on that one-time stream; ~1.4x at bench scale;
    # Sinkhorn loop math stays f32; reference-evaluate R@K parity within the
    # +-0.2 protocol tolerance — tests/test_e2e_parity.py).  Default f32 is
    # the bit-faithful path.
    rerank_bf16: bool = False
    # device-resident training-image cache + on-device augmentation
    # (data/device_cache.py): the raw images load into HBM once and the
    # RandomResizedCrop/flip/normalize run inside the jitted step — an epoch
    # moves no image bytes over the host link.  Opt-in (CUB-scale fits
    # trivially; SOP at 256px uint8 is ~11.6 GB of a 16 GB chip).
    cache_device: bool = False
    # per-subcache val-query feature-drift MSE tracking (MSLS; reference
    # train_epoch_KD_xbm.py:276-303 — embed, save feat_<i>.npz, log MSE)
    track_drift: bool = False
    pretrained_ckpt: Optional[str] = None  # torch checkpoint for converters
    # convert_checkpoint --audit: dry-run the converter under the consumption
    # audit (core/convert.py::audit_conversion) and print the named diff —
    # nothing is written.  First-real-checkpoint contact check.
    audit: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool) or f.name in ("bf16", "narrow_sm"):
            # BooleanOptionalAction: `--flag` still sets True like the
            # reference's store_true flags, and `--no-flag` can disable
            # True-by-default framework options (device_batch); bf16 and
            # narrow_sm are tri-state (None = per-context default, see the
            # field comments)
            parser.add_argument(
                name, action=argparse.BooleanOptionalAction, default=f.default
            )
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            d = f.default_factory()  # type: ignore[misc]
            el = type(d[0]) if d else str
            parser.add_argument(name, nargs="+", type=el, default=d)
        else:
            t = type(f.default) if f.default is not None else str
            parser.add_argument(name, type=t, default=f.default)
    return parser


def from_args(argv: Optional[Sequence[str]] = None) -> Config:
    args = build_parser().parse_args(argv)
    return Config(**vars(args))
