"""Named driver alias (the reference's missing train_msls_KDembed.py, referenced by its
scripts/): the behavior is train_msls_baseline with distillation flags —
embed-KD (--distill embed), triplet+KD (--distill embed --tl_weight >0), or
XBM (--enable_xbm)."""

from .train_msls_baseline import main

if __name__ == "__main__":
    main()
