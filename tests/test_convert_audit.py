"""Converter load-time audit (VERDICT r3 item 4): first contact with a real
released ``.pth`` must fail LOUDLY and NAME the divergence — unconsumed keys,
missing keys, shape mismatches — instead of silently dropping weights like
``load_state_dict(strict=False)`` would (reference cvt.py:713-722)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vit_reranking_tpu.core import convert
from vit_reranking_tpu.core.convert import (
    ConversionAuditError,
    TrackedStateDict,
    audit_conversion,
)
from vit_reranking_tpu.models.resnet import ResNet50Network

from test_convert import TorchResNet50Trunk


def _resnet_fixtures():
    torch.manual_seed(0)
    tm = TorchResNet50Trunk().eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    model = ResNet50Network(embed_dim=8, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    return sd, variables


def test_audit_clean_checkpoint_passes():
    sd, variables = _resnet_fixtures()
    report = audit_conversion("resnet50_normalize", sd, variables=variables)
    assert report["problems"] == []
    assert report["unconsumed"] == []
    # torch BN bookkeeping buffers are ignorable, not errors
    assert all("num_batches_tracked" in k for k in report["ignored_unconsumed"])
    # the fresh embedding head is uncovered by design (strict=False semantics)
    assert any("last_linear" in k or "embed" in k.lower()
               for k in report["uncovered_init_leaves"])


def test_audit_flags_unconsumed_key():
    sd, variables = _resnet_fixtures()
    sd["layer1.0.ghost.weight"] = torch.zeros(3, 3)
    with pytest.raises(ConversionAuditError, match="ghost"):
        audit_conversion("resnet50_normalize", sd, variables=variables)
    # non-strict returns the named diff instead
    report = audit_conversion(
        "resnet50_normalize", sd, variables=variables, strict=False
    )
    assert "layer1.0.ghost.weight" in report["unconsumed"]


def test_audit_flags_missing_key():
    sd, variables = _resnet_fixtures()
    del sd["conv1.weight"]
    with pytest.raises(ConversionAuditError, match="conv1.weight"):
        audit_conversion("resnet50_normalize", sd, variables=variables)


def test_audit_flags_shape_mismatch():
    sd, variables = _resnet_fixtures()
    sd["bn1.weight"] = torch.zeros(65)  # real width is 64
    with pytest.raises(ConversionAuditError, match="bn1"):
        audit_conversion("resnet50_normalize", sd, variables=variables)
    report = audit_conversion(
        "resnet50_normalize", sd, variables=variables, strict=False
    )
    assert any("(65,)" in m and "(64,)" in m for m in report["shape_mismatches"])


def test_audit_ignores_classifier_head():
    """Real torchvision checkpoints carry fc.weight/fc.bias — documented as
    replaced by the fresh DML head, so they must not fail the audit."""
    sd, variables = _resnet_fixtures()
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    report = audit_conversion("resnet50_normalize", sd, variables=variables)
    assert "fc.weight" in report["ignored_unconsumed"]
    assert report["problems"] == []


def test_tracked_state_dict_rename_transfers_origin():
    """The sd[new] = sd.pop(old) rename idiom (convert_densenet legacy keys)
    must credit consumption to the ORIGINAL key name."""
    t = TrackedStateDict({"a.old": 1, "b": 2})
    t["a.new"] = t.pop("a.old")
    assert t.unconsumed() == ["a.old", "b"]  # nothing read yet
    _ = t["a.new"]
    assert t.unconsumed() == ["b"]  # reading the renamed key consumed a.old
    _ = t["b"]
    assert t.unconsumed() == []


def test_tracked_through_strip_prefix():
    t = TrackedStateDict({"module.x": 1, "module.y": 2})
    s = convert.strip_prefix(t, "module.")
    _ = s["x"]
    assert s.unconsumed() == ["module.y"]  # original names reported


def test_cli_audit_mode(tmp_path):
    """convert_checkpoint --audit dry-runs: prints the diff, writes nothing,
    exits 1 on a corrupted checkpoint."""
    from vit_reranking_tpu.cli.convert_checkpoint import main

    torch.manual_seed(1)
    tm = TorchResNet50Trunk().eval()
    pth = tmp_path / "resnet50.pth"
    torch.save(tm.state_dict(), pth)

    out = main([
        "--arch", "resnet50_normalize", "--embed_dim", "8",
        "--pretrained_ckpt", str(pth), "--audit", "--seed", "0",
    ])
    assert out is None
    assert not (tmp_path / "orbax").exists()

    bad = dict(tm.state_dict())
    bad["stray.subtree.weight"] = torch.zeros(2)
    pth_bad = tmp_path / "bad.pth"
    torch.save(bad, pth_bad)
    with pytest.raises(SystemExit):
        main([
            "--arch", "resnet50_normalize", "--embed_dim", "8",
            "--pretrained_ckpt", str(pth_bad), "--audit", "--seed", "0",
        ])


def test_load_pretrained_into_is_strict(tmp_path):
    """The production load path (cli/common.py::load_pretrained_into) rejects
    a checkpoint with an unconsumed subtree — no more silent drops."""
    from vit_reranking_tpu.cli.common import load_pretrained_into
    from vit_reranking_tpu.core.config import Config

    torch.manual_seed(2)
    tm = TorchResNet50Trunk().eval()
    sd = dict(tm.state_dict())
    sd["renamed_stage.0.weight"] = torch.zeros(4, 4)
    pth = tmp_path / "renamed.pth"
    torch.save(sd, pth)

    model = ResNet50Network(embed_dim=8, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    opt = Config(dataset="synthetic", arch="resnet50_normalize",
                 pretrained_ckpt=str(pth))
    with pytest.raises(ConversionAuditError, match="renamed_stage"):
        load_pretrained_into(opt, dict(variables))
