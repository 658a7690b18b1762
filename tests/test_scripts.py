"""Canonical config scripts stay parseable and dispatchable.

Parity: /root/reference/exp/scripts/*.sh (25 canonical configs). Each of our
scripts/*.sh must (a) exist 1:1 with the reference set, (b) parse cleanly
through cwn_tpu.exp.parser.get_parser, and (c) name a model that
cwn_tpu.exp.run_exp.build_model can dispatch.
"""
import os
import re
import shlex

import pytest

from cwn_tpu.exp.parser import get_parser

SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "scripts")
REFERENCE_SCRIPTS = {
    "cin++-molhiv-small.sh", "cin++-molhiv.sh", "cin++-nci109.sh",
    "cin++-pep-f.sh", "cin++-pep-s.sh", "cin++-zinc-500k.sh",
    "cin++-zinc-small.sh", "cin++-zinc.sh", "cwn-csl.sh",
    "cwn-molhiv-small.sh", "cwn-molhiv.sh", "cwn-nci109.sh",
    "cwn-sr-base.sh", "cwn-sr.sh", "cwn-zinc-full-small.sh",
    "cwn-zinc-full.sh", "cwn-zinc-small.sh", "cwn-zinc.sh",
    "gnn-inv-flow.sh", "gnn-inv-ocean.sh", "mpsn-flow.sh",
    "mpsn-ocean.sh", "mpsn-redditb.sh", "mpsn-sr-base.sh", "mpsn-sr.sh",
}

# Models dispatched by build_model (cwn_tpu/exp/run_exp.py:31).
KNOWN_MODELS = {
    "cin0", "edge_cin0", "sparse_cin", "cin", "cin++", "cin_pp", "cinpp",
    "dummy", "mp_agnostic", "embed_sparse_cin", "embed_cin++",
    "embed_cin_pp", "embed_sparse_cin_no_rings", "ogb_embed_sparse_cin",
    "ogb_embed_cin++", "ogb_embed_cin_pp", "embed_gin", "edge_orient",
    "edge_mpnn", "ring_sparse_cin", "ring_gin", "gin", "gin0", "gin_jk",
    "gin0_jk",
}


def _script_args(path):
    """Extract the CLI flag tokens from a one-command shell script."""
    with open(path) as f:
        text = f.read()
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("python -m "):
            toks = shlex.split(line)
            module = toks[2]
            # Positional shell args become placeholder values.
            flags = [re.sub(r"^\$\d$", "6", t).replace('"$1"', "tanh")
                     for t in toks[3:]]
            flags = ["tanh" if t == "$1" else t for t in flags]
            return module, flags
    raise AssertionError(f"no python command in {path}")


def test_script_set_matches_reference():
    ours = {f for f in os.listdir(SCRIPTS_DIR) if f.endswith(".sh")}
    assert ours == REFERENCE_SCRIPTS


@pytest.mark.parametrize("name", sorted(REFERENCE_SCRIPTS))
def test_script_parses_and_dispatches(name):
    module, flags = _script_args(os.path.join(SCRIPTS_DIR, name))
    assert module.startswith("cwn_tpu.exp."), module
    args = get_parser().parse_args(flags)
    assert args.model in KNOWN_MODELS, args.model
    if "zinc" in name:
        assert args.minimize and args.eval_metric == "mae"
        assert args.max_ring_size == 18
    if "sr" in name and "csl" not in name:
        assert args.untrained and args.task_type == "isomorphism"
