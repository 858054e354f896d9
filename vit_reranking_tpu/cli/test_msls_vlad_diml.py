"""Named alias (the reference's missing test_msls_vlad_diml.py): MSLS recall
eval of the Patch-NetVLAD model with DIML reranking = test_msls_baseline with
--arch patchnetvlad --use_ot."""

from .test_msls_baseline import main

if __name__ == "__main__":
    main()
