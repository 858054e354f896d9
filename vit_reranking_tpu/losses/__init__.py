"""Loss registry (mirrors reference criteria/__init__.py:16-62).

``select(loss, opt, batchminer)`` returns ``(criterion, param_groups)`` where
``param_groups`` lists ``(name, init_fn, lr)`` for criteria with learnable
parameters (REQUIRES_OPTIM) — the training engine registers these with their
own learning rate, replacing the reference's ``to_optim`` list-of-dicts.
"""

from __future__ import annotations

from .adversarial_separation import AdversarialSeparationLoss
from .angular import AngularLoss
from .arcface import ArcFaceLoss
from .contrastive import ContrastiveLoss
from .histogram import HistogramLoss
from .lifted import LiftedLoss
from .margin import MarginLoss
from .margin_cross import MarginCrossDIMLLoss, MarginCrossEmbedLoss
from .margin_diml import MarginDIMLLoss
from .multisimilarity import MultisimilarityLoss
from .multisimilarity_diml import MultisimilarityDIMLLoss
from .npair import NPairLoss
from .proxynca import ProxyNCALoss
from .quadruplet import QuadrupletLoss
from .snr import SNRLoss
from .softmax import SoftmaxLoss
from .softtriplet import SoftTripletLoss
from .triplet import TripletLoss

LOSSES = {
    "triplet": TripletLoss,
    "margin": MarginLoss,
    "margin_diml": MarginDIMLLoss,
    "proxynca": ProxyNCALoss,
    "npair": NPairLoss,
    "angular": AngularLoss,
    "contrastive": ContrastiveLoss,
    "lifted": LiftedLoss,
    "snr": SNRLoss,
    "multisimilarity": MultisimilarityLoss,
    "multisimilarity_diml": MultisimilarityDIMLLoss,
    "histogram": HistogramLoss,
    "softmax": SoftmaxLoss,
    "softtriplet": SoftTripletLoss,
    "arcface": ArcFaceLoss,
    "quadruplet": QuadrupletLoss,
    "adversarial_separation": AdversarialSeparationLoss,
    "margin_cross_embed": MarginCrossEmbedLoss,
    "margin_cross_diml": MarginCrossDIMLLoss,
}


def select(loss: str, opt, batchminer=None):
    if loss not in LOSSES:
        raise NotImplementedError(f"Loss {loss} not implemented!")
    cls = LOSSES[loss]

    if cls.REQUIRES_BATCHMINER:
        if batchminer is None:
            raise Exception(
                f"Loss {loss} requires one of the following batch mining methods: "
                f"{cls.ALLOWED_MINING_OPS}"
            )
        if batchminer.name not in cls.ALLOWED_MINING_OPS:
            raise Exception(f"{batchminer.name}-mining not allowed for {loss}-loss!")
        criterion = cls(opt, batchminer)
    else:
        criterion = cls(opt)

    param_groups = []
    if cls.REQUIRES_OPTIM:
        param_groups.append(("criterion", criterion.init_params, criterion.lr))
    return criterion, param_groups
