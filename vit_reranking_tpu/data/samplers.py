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
