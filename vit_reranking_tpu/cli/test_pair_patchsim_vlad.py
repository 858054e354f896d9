"""Named alias (the reference's missing test_pair_patchsim_vlad.py): the
patch-similarity probe over the NetVLAD encoder = test_pair_patchsim with
--arch patchnetvlad."""

from .test_pair_patchsim import main

if __name__ == "__main__":
    main()
