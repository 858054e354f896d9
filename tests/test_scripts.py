"""Every reference scripts/**/*.sh has a same-named repo counterpart whose
flags all parse (BASELINE.json: "existing scripts/configs run with a one-line
device change"; reference scripts tree at /root/reference/scripts)."""

import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SCRIPTS = "/root/reference/scripts"


def _repo_scripts():
    out = []
    for root, _, files in os.walk(os.path.join(REPO, "scripts")):
        for f in files:
            if f.endswith(".sh"):
                out.append(os.path.join(root, f))
    return sorted(out)


@pytest.mark.skipif(not os.path.isdir(REF_SCRIPTS), reason="reference not mounted")
def test_every_reference_script_has_counterpart():
    missing = []
    for root, _, files in os.walk(REF_SCRIPTS):
        rel = os.path.relpath(root, REF_SCRIPTS)
        for f in files:
            if not f.endswith(".sh"):
                continue
            if not os.path.isfile(os.path.join(REPO, "scripts", rel, f)):
                missing.append(os.path.join(rel, f))
    assert not missing, f"reference scripts without repo counterpart: {missing}"


def test_scripts_are_valid_bash():
    for path in _repo_scripts():
        proc = subprocess.run(["bash", "-n", path], capture_output=True, text=True)
        assert proc.returncode == 0, f"{path}: {proc.stderr}"


def test_script_flags_parse():
    """Every --flag mentioned in any repo script is a known config/CLI flag."""
    from vit_reranking_tpu.core.config import build_parser

    parser = build_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    # flags added by CLI wrappers on top of the shared config parser
    for cli_mod in ("test_diml", "test_diml_base", "test_msls_baseline"):
        src = open(
            os.path.join(REPO, "vit_reranking_tpu", "cli", cli_mod + ".py")
        ).read()
        known.update(re.findall(r"\"(--[a-zA-Z_0-9]+)\"", src))
        known.update(re.findall(r"'(--[a-zA-Z_0-9]+)'", src))

    for path in _repo_scripts():
        text = open(path).read()
        for flag in re.findall(r"(--[a-zA-Z_0-9]+)", text):
            assert flag in known, f"{path} uses unknown flag {flag}"


def test_script_cli_modules_exist():
    for path in _repo_scripts():
        text = open(path).read()
        for mod in re.findall(r"python -m ([\w\.]+)", text):
            rel = mod.replace(".", os.sep) + ".py"
            assert os.path.isfile(os.path.join(REPO, rel)), f"{path} -> missing {mod}"
