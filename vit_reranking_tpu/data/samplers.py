"""Batch samplers (host-side index generation, reproducible numpy RNG).

Mirrors the reference datasampler/ package (which ships without its
__init__.py dispatcher — SURVEY.md section 0.1).  Storage-based samplers keep
an embedding storage refreshed by the training engine via the
``create_storage / replace_storage_entries / full_storage_update /
precompute_indices`` hooks (reference greedy_coreset_sampler.py:79-117,
train_diml.py:116-120,228-229,283-284).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class ClassRandomSampler:
    """SPC-N class sampling — the canonical batch sampler
    (reference datasampler/class_random_sampler.py:12-49)."""

    REQUIRES_STORAGE = False

    def __init__(self, opt, image_dict, image_list, seed: Optional[int] = None, **kw):
        self.image_dict = image_dict
        self.image_list = image_list
        self.classes = list(image_dict.keys())
        self.batch_size = opt.bs
        self.samples_per_class = opt.samples_per_class
        self.sampler_length = len(image_list) // opt.bs
        assert self.batch_size % self.samples_per_class == 0, \
            "#Samples per class must divide batchsize!"
        self.rng = np.random.default_rng(seed if seed is not None else opt.seed)
        self.name = "class_random_sampler"
        self.requires_storage = False

    def __iter__(self):
        for _ in range(self.sampler_length):
            subset: List[int] = []
            draws = self.batch_size // self.samples_per_class
            for _ in range(draws):
                cls = self.classes[self.rng.integers(len(self.classes))]
                members = self.image_dict[cls]
                picks = self.rng.integers(len(members), size=self.samples_per_class)
                subset.extend(members[p][-1] for p in picks)
            yield subset

    def __len__(self):
        return self.sampler_length


class RandomSampler:
    """Fully random batches + one guaranteed positive pair
    (reference datasampler/random_sampler.py:12-41)."""

    REQUIRES_STORAGE = False

    def __init__(self, opt, image_dict, image_list, seed: Optional[int] = None, **kw):
        self.image_dict = image_dict
        self.image_list = image_list
        self.batch_size = opt.bs
        self.samples_per_class = opt.samples_per_class
        self.sampler_length = len(image_list) // opt.bs
        self.rng = np.random.default_rng(seed if seed is not None else opt.seed)
        self.name = "random_sampler"
        self.requires_storage = False

    def __iter__(self):
        keys = list(self.image_dict.keys())
        for _ in range(self.sampler_length):
            subset = []
            for _ in range(self.batch_size - 1):
                cls = keys[self.rng.integers(len(keys))]
                members = self.image_dict[cls]
                subset.append(members[self.rng.integers(len(members))][-1])
            # close with a positive partner of a random already-drawn sample
            anchor = subset[self.rng.integers(len(subset))]
            cls = self.image_list[anchor][-1]
            members = self.image_dict[cls]
            subset.append(members[self.rng.integers(len(members))][-1])
            yield subset

    def __len__(self):
        return self.sampler_length


class GreedyCoresetSampler:
    """Diversity-seeking batches via greedy coreset over an embedding storage
    (reference datasampler/greedy_coreset_sampler.py:12-156, de-parallelized:
    the joblib fan-out is host-side bookkeeping, not a bottleneck here)."""

    REQUIRES_STORAGE = True

    def __init__(self, opt, image_dict, image_list, seed: Optional[int] = None, **kw):
        self.image_dict = image_dict
        self.image_list = image_list
        self.batch_size = opt.bs
        self.samples_per_class = opt.samples_per_class
        self.sampler_length = len(image_list) // opt.bs
        assert self.batch_size % self.samples_per_class == 0
        self.bigbs = getattr(opt, "data_batchmatch_bigbs", 512)
        self.update_storage = not getattr(opt, "data_storage_no_update", False)
        self.low_proj_dim = getattr(opt, "data_sampler_lowproj_dim", -1)
        self.softened = getattr(opt, "data_gc_softened", False)
        self.mb_mom = getattr(opt, "data_mb_mom", -1)
        self.mb_lr = getattr(opt, "data_mb_lr", 1)
        self.rng = np.random.default_rng(seed if seed is not None else opt.seed)
        self.name = "greedy_coreset_sampler"
        self.requires_storage = True
        self.storage: Optional[np.ndarray] = None
        self.delta_storage: Optional[np.ndarray] = None
        self.epoch_indices: List[List[int]] = []

    # ---- storage hooks (driven by the engine; embeddings come from a jitted
    # forward pass, so these receive plain numpy arrays)
    def create_storage(self, embeddings: np.ndarray):
        self.storage = np.asarray(embeddings, np.float32)
        self.delta_storage = np.zeros_like(self.storage)

    def replace_storage_entries(self, embeddings, indices):
        self.storage[np.asarray(indices)] = np.asarray(embeddings, np.float32)

    def full_storage_update(self, embeddings):
        embeddings = np.asarray(embeddings, np.float32)
        if self.mb_mom > 0:
            self.delta_storage = self.mb_mom * self.delta_storage + (
                1 - self.mb_mom
            ) * (embeddings - self.storage)
            self.storage = embeddings + self.mb_lr * self.delta_storage
        else:
            self.storage = embeddings

    def _greedy_coreset(self, bigbatch: np.ndarray, batch_size: int) -> List[int]:
        if self.low_proj_dim > 0:
            proj = self.rng.standard_normal((bigbatch.shape[-1], self.low_proj_dim))
            proj /= np.sqrt(bigbatch.shape[-1])
            bigbatch = bigbatch @ proj
        prod = bigbatch @ bigbatch.T
        sq = prod.diagonal().reshape(-1, 1)
        dist = np.clip(-2 * prod + sq + sq.T, 0, None)
        anchor_d = np.linalg.norm(dist, axis=1)
        picked = []
        for k in range(batch_size):
            if k == 0:
                no = int(self.rng.integers(len(anchor_d)))
            elif self.softened:
                cand = np.where(anchor_d >= np.percentile(anchor_d, 97))[0]
                no = int(cand[self.rng.integers(len(cand))])
            else:
                no = int(np.argmax(anchor_d))
            picked.append(no)
            anchor_d = np.minimum(anchor_d, dist[:, no])
        return picked

    def precompute_indices(self):
        assert self.storage is not None, "create_storage must run first"
        self.epoch_indices = []
        per_batch = self.batch_size // self.samples_per_class
        bigbs = min(self.bigbs, len(self.storage))
        for _ in range(self.sampler_length):
            big_idx = self.rng.choice(len(self.storage), bigbs, replace=False)
            picks = self._greedy_coreset(self.storage[big_idx], per_batch)
            batch = [int(big_idx[p]) for p in picks]
            # per-class fillers so SPC holds (greedy_coreset_sampler.py:59-63)
            for idx in list(batch):
                cls = self.image_list[idx][-1]
                members = self.image_dict[cls]
                for _ in range(self.samples_per_class - 1):
                    batch.append(members[self.rng.integers(len(members))][-1])
            self.epoch_indices.append(batch)

    def __iter__(self):
        for b in self.epoch_indices:
            yield b

    def __len__(self):
        return self.sampler_length


SAMPLERS = {
    "class_random": ClassRandomSampler,
    "random": RandomSampler,
    "greedy_coreset": GreedyCoresetSampler,
}


def select(name: str, opt, image_dict, image_list, **kw):
    """Dispatcher contract of the reference's missing datasampler/__init__.py
    (called as dsamplers.select(opt.data_sampler, opt, image_dict, image_list),
    train_diml.py:116)."""
    key = name.replace("_sampler", "")
    if key not in SAMPLERS:
        raise NotImplementedError(f"datasampler {name} not available!")
    return SAMPLERS[key](opt, image_dict, image_list, **kw)


class D2CoresetSampler(GreedyCoresetSampler):
    """D2-weighted coreset batches (reference datasampler/d2_coreset_sampler.py):
    start from a density-sampled anchor, then grow the batch with probability
    proportional to gaussian density x accumulated distance^lambda."""

    REQUIRES_STORAGE = True

    def __init__(self, opt, image_dict, image_list, seed: Optional[int] = None, **kw):
        super().__init__(opt, image_dict, image_list, seed=seed, **kw)
        self.lam = getattr(opt, "data_d2_coreset_lambda", 1.0)
        self.name = "d2_coreset_sampler"

    def _d2_coreset(self, bigbatch: np.ndarray, batch_size: int) -> List[int]:
        from scipy.stats import multivariate_normal

        emp_mean = np.mean(bigbatch, axis=0)
        emp_cov = np.cov(bigbatch.T) + 1e-6 * np.eye(bigbatch.shape[1])
        prod = bigbatch @ bigbatch.T
        sq = prod.diagonal().reshape(-1, 1)
        dist = np.clip(-2 * prod + sq + sq.T, 0, None)

        start_anchor = self.rng.multivariate_normal(emp_mean, emp_cov)
        start = int(np.argmin(np.linalg.norm(bigbatch - start_anchor, axis=1)))
        idxs = list(range(len(bigbatch)))
        del idxs[start]
        picked = [start]
        dist_w = dist[:, start].copy()
        normal_w = multivariate_normal.pdf(
            bigbatch, emp_mean, emp_cov, allow_singular=True
        )
        for _ in range(1, batch_size):
            nw = normal_w[idxs] / max(normal_w[idxs].sum(), 1e-30)
            p = nw * dist_w[idxs] ** self.lam
            p = p / max(p.sum(), 1e-30)
            j = int(self.rng.choice(len(idxs), p=p))
            sample = idxs.pop(j)
            picked.append(sample)
            dist_w = dist_w + dist[:, sample]
        return picked

    def precompute_indices(self):
        assert self.storage is not None
        self.epoch_indices = []
        per_batch = self.batch_size // self.samples_per_class
        bigbs = min(self.bigbs, len(self.storage))
        for _ in range(self.sampler_length):
            big_idx = self.rng.choice(len(self.storage), bigbs, replace=False)
            picks = self._d2_coreset(self.storage[big_idx], per_batch)
            batch = [int(big_idx[p]) for p in picks]
            for idx in list(batch):
                members = self.image_dict[self.image_list[idx][-1]]
                for _ in range(self.samples_per_class - 1):
                    batch.append(members[self.rng.integers(len(members))][-1])
            self.epoch_indices.append(batch)


class _SPCBatchMatchSampler(GreedyCoresetSampler):
    """Shared SPC big-batch machinery for the batch-match samplers
    (reference fid/disthist_batchmatch_sampler.py spc_batchfinder)."""

    def __init__(self, opt, image_dict, image_list, seed: Optional[int] = None, **kw):
        super().__init__(opt, image_dict, image_list, seed=seed, **kw)
        self.num_batch_comps = getattr(opt, "data_batchmatch_ncomps", 10)

    def _spc_bigbatch(self):
        keys = list(self.image_dict.keys())
        subset, classes = [], []
        for _ in range(self.bigbs // self.samples_per_class):
            cls = keys[self.rng.integers(len(keys))]
            members = self.image_dict[cls]
            for _ in range(self.samples_per_class):
                subset.append(members[self.rng.integers(len(members))][-1])
                classes.append(cls)
        return np.asarray(subset), np.asarray(classes)

    def _candidate_subsets(self, classes):
        bigb_dict: Dict = {}
        for i, c in enumerate(classes):
            bigb_dict.setdefault(c, []).append(i)
        keys = list(bigb_dict.keys())
        cands = []
        for _ in range(self.num_batch_comps):
            rows = []
            for _ in range(self.batch_size // self.samples_per_class):
                cls = keys[self.rng.integers(len(keys))]
                pool = bigb_dict[cls]
                take = self.rng.choice(
                    pool, self.samples_per_class, replace=len(pool) < self.samples_per_class
                )
                rows.extend(int(t) for t in take)
            cands.append(rows)
        return cands

    def _cost(self, bigbatch, subset):
        raise NotImplementedError

    def precompute_indices(self):
        assert self.storage is not None
        self.epoch_indices = []
        for _ in range(self.sampler_length):
            data_idx, classes = self._spc_bigbatch()
            bigbatch = self.storage[data_idx]
            cands = self._candidate_subsets(classes)
            costs = [self._cost(bigbatch, bigbatch[c]) for c in cands]
            best = cands[int(np.argmin(costs))]
            self.epoch_indices.append([int(data_idx[i]) for i in best])


class FIDBatchmatchSampler(_SPCBatchMatchSampler):
    """Pick the candidate batch with the lowest Frechet distance to the big
    batch (reference datasampler/fid_batchmatch_sampler.py:105-143)."""

    REQUIRES_STORAGE = True
    name = "fid_batchmatch_sampler"

    def _cost(self, bigbatch, subset):
        from scipy import linalg

        mu_b = bigbatch.mean(0)
        mu_s = subset.mean(0)
        cov_b = np.cov(bigbatch.T)
        cov_s = np.cov(subset.T)
        eye = np.eye(cov_b.shape[0]) * 1e-8
        cov_sqrt = linalg.sqrtm((cov_b + eye) @ (cov_s + eye), disp=False)[0].real
        diff = mu_b - mu_s
        return float(diff @ diff + np.trace(cov_b) + np.trace(cov_s) - 2 * np.trace(cov_sqrt))


class DistHistBatchmatchSampler(_SPCBatchMatchSampler):
    """Match the pairwise-distance histogram + moment statistics of the big
    batch (reference datasampler/disthist_batchmatch_sampler.py:99-160)."""

    REQUIRES_STORAGE = True
    name = "disthist_batchmatch_sampler"

    @staticmethod
    def _distvals(arr):
        prod = arr @ arr.T
        sq = prod.diagonal().reshape(-1, 1)
        d = np.sqrt(np.clip(-2 * prod + sq + sq.T, 0, None))
        return d[np.triu_indices(len(arr), 1)]

    def _cost(self, bigbatch, subset):
        from scipy.stats import wasserstein_distance

        bv = self._distvals(bigbatch)
        rng_ = (bv.min(), bv.max())
        bh, _ = np.histogram(bv, bins=50, range=rng_)
        bh = bh / max(bh.sum(), 1)
        sv = self._distvals(subset)
        sh, _ = np.histogram(sv, bins=50, range=rng_)
        sh = sh / max(sh.sum(), 1)
        wd = wasserstein_distance(bh, sh) + wasserstein_distance(sh, bh)
        return float(
            np.linalg.norm(bigbatch.mean(0) - subset.mean(0))
            + np.linalg.norm(bigbatch.std(0) - subset.std(0))
            + 75 * wd
        )


SAMPLERS.update(
    {
        "d2_coreset": D2CoresetSampler,
        "fid_batchmatch": FIDBatchmatchSampler,
        "disthist_batchmatch": DistHistBatchmatchSampler,
    }
)


class AdvancedSampler:
    """Unified batch-selection sampler (reference datasampler/samplers.py:18-171,
    the `AdvancedSampler` the registry never dispatched to — its methods are
    exposed here under their reference names):

      * ``class_random`` / ``semi_class_random`` — no storage;
      * ``greedy_class_coreset`` — greedy coreset WITHIN each sampled class;
      * ``greedy_semi_class_coreset`` — coreset over a random subset for half
        the batch, other half filled with same-class partners;
      * ``presampled_infobatch`` — half the batch drawn by inverse-sphere
        pair weighting over a random subset (distance-miner distribution,
        samplers.py:126-152), same-class pairs masked, rest same-class fill.

    Storage is a (N, D) embedding matrix maintained by the engine through the
    same hooks as the other storage samplers; selection math runs in numpy
    (host-side bookkeeping — the embeddings already come from the device)."""

    REQUIRES_STORAGE = True  # except the two random modes, see requires_storage

    def __init__(self, opt, image_dict, image_list, method="class_random",
                 seed: Optional[int] = None, **kw):
        self.image_dict = image_dict
        self.image_list = image_list
        self.method = method
        self.batch_size = opt.bs
        self.samples_per_class = getattr(opt, "samples_per_class", 2)
        self.random_subset_perc = getattr(opt, "primary_subset_perc", 0.1)
        self.sampler_length = len(image_list) // opt.bs
        self.rng = np.random.default_rng(seed if seed is not None else opt.seed)
        self.name = f"advanced_{method}"
        self.requires_storage = method in (
            "greedy_class_coreset", "greedy_semi_class_coreset",
            "presampled_infobatch",
        )
        self.update_storage = self.requires_storage
        self.storage: Optional[np.ndarray] = None
        self.epoch_indices: List[List[int]] = []
        self._class_keys = list(image_dict.keys())

    # ---- storage hooks (engine contract, same as GreedyCoresetSampler)
    def create_storage(self, embeddings: np.ndarray):
        self.storage = np.asarray(embeddings, np.float32)

    def replace_storage_entries(self, embeddings, indices):
        self.storage[np.asarray(indices)] = np.asarray(embeddings, np.float32)

    def full_storage_update(self, embeddings):
        self.storage = np.asarray(embeddings, np.float32)

    # ---- selection primitives
    @staticmethod
    def _pdistsq(A: np.ndarray) -> np.ndarray:
        prod = A @ A.T
        sq = prod.diagonal().reshape(-1, 1)
        return -2 * prod + sq + sq.T

    def _greedy_coreset(self, A: np.ndarray, samples: int) -> List[int]:
        """Farthest-point traversal seeded at random (samplers.py:108-125)."""
        dist = self._pdistsq(A)
        anchor_d = np.linalg.norm(dist, axis=1)
        picked = []
        for k in range(samples):
            no = (
                int(self.rng.integers(len(anchor_d))) if k == 0
                else int(np.argmax(anchor_d))
            )
            picked.append(no)
            anchor_d = np.minimum(anchor_d, dist[:, no])
        return picked

    def _presample_infobatch(self, classes: np.ndarray, A: np.ndarray,
                             samples: int) -> List[int]:
        """Inverse-sphere pair sampling (samplers.py:126-152): log q^-1 =
        (2-d) log r - ((d-3)/2) log(1 - r^2/4) over the pairwise squared
        distances clamped at 0.5, same-class pairs masked.  The log argument
        is floored at 1e-12 (the reference lets it go negative -> NaN)."""
        n, dim = A.shape
        same = classes.reshape(-1, 1) == classes.reshape(1, -1)
        r = np.clip(self._pdistsq(A), 0.5, None)
        logq = (2.0 - dim) * np.log(r) - ((dim - 3) / 2.0) * np.log(
            np.clip(1.0 - 0.25 * r**2, 1e-12, None)
        )
        logq[same] = 0.0
        w = np.exp(logq - logq.max()).astype(np.float64)
        w[same] = 0.0
        w = (w / w.sum()).reshape(-1)

        picked: set = set()
        while len(picked) < samples:
            total = w.sum()
            if total <= 0.0:  # pair pool exhausted (tiny subsets) — random fill
                rest = [i for i in range(n) if i not in picked]
                self.rng.shuffle(rest)
                picked |= set(rest[: samples - len(picked)])
                break
            idx = int(self.rng.choice(len(w), p=w / total))
            w[idx] = 0.0
            picked |= {idx // n, idx % n}
        return list(picked)[:samples]

    def _rand_class_member(self, cls) -> int:
        members = self.image_dict[cls]
        return members[self.rng.integers(len(members))][-1]

    def _one_batch(self) -> List[int]:
        bs, spc = self.batch_size, self.samples_per_class
        if self.method == "class_random":
            batch = []
            for _ in range(bs // spc):
                cls = self._class_keys[self.rng.integers(len(self._class_keys))]
                batch.extend(self._rand_class_member(cls) for _ in range(spc))
            return batch
        if self.method == "semi_class_random":
            batch = []
            for _ in range(bs // 2):
                ridx = int(self.rng.integers(len(self.image_list)))
                cls = self.image_list[ridx][-1]
                batch.extend([ridx, self._rand_class_member(cls)])
            return batch

        assert self.storage is not None, "create_storage must run first"
        sub_len = min(
            len(self.storage),
            max(self.batch_size, int(self.random_subset_perc * len(self.storage))),
        )
        if self.method == "greedy_class_coreset":
            batch = []
            for _ in range(bs // spc):
                cls = self._class_keys[self.rng.integers(len(self._class_keys))]
                cls_idx = np.asarray([x[1] for x in self.image_dict[cls]])
                picks = self._greedy_coreset(
                    self.storage[cls_idx], min(spc, len(cls_idx))
                )
                batch.extend(int(cls_idx[p]) for p in picks)
            return batch
        if self.method == "greedy_semi_class_coreset":
            subset = self.rng.integers(0, len(self.storage), sub_len)
            picks = self._greedy_coreset(self.storage[subset], bs // 2)
            half = [int(subset[p]) for p in picks]
            return half + [
                self._rand_class_member(self.image_list[i][-1]) for i in half
            ]
        if self.method == "presampled_infobatch":
            subset = self.rng.integers(0, len(self.storage), sub_len)
            classes = np.asarray([self.image_list[i][-1] for i in subset])
            picks = self._presample_infobatch(
                classes, self.storage[subset], bs // 2
            )
            half = [int(subset[p]) for p in picks]
            return half + [
                self._rand_class_member(self.image_list[i][-1]) for i in half
            ]
        raise NotImplementedError(
            f"Batch selection method {self.method} not available!"
        )

    def precompute_indices(self):
        self.epoch_indices = [self._one_batch() for _ in range(self.sampler_length)]

    def __iter__(self):
        if not self.epoch_indices:
            self.precompute_indices()
        batches, self.epoch_indices = self.epoch_indices, []
        # epoch_indices are consumed: the next epoch re-draws fresh random
        # batches (reference AdvancedSampler.__iter__ samples anew each
        # epoch, datasampler/samplers.py:152-161) unless the training loop
        # explicitly precomputes again (the storage-based flow)
        for b in batches:
            yield b

    def __len__(self):
        return self.sampler_length


def _advanced(method):
    def build(opt, image_dict, image_list, **kw):
        return AdvancedSampler(opt, image_dict, image_list, method=method, **kw)

    return build


SAMPLERS.update(
    {
        "greedy_class_coreset": _advanced("greedy_class_coreset"),
        "greedy_semi_class_coreset": _advanced("greedy_semi_class_coreset"),
        "presampled_infobatch": _advanced("presampled_infobatch"),
        "semi_class_random": _advanced("semi_class_random"),
    }
)
