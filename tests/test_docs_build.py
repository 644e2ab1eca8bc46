"""The static API-doc generator must stay buildable and cover every public
symbol (the reference ships a rendered Sphinx site; docs/build_docs.py is
the sphinx-free equivalent, committed under docs/site/)."""
import os
import sys


def test_docs_build_covers_public_surface(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "docs"))
    import build_docs
    n = build_docs.build(str(tmp_path))
    assert n >= 150  # public symbols across the 20 documented modules
    pages = os.listdir(tmp_path)
    assert "index.html" in pages and len(pages) == len(build_docs.MODULES) + 1
    models = open(tmp_path / "pyroved_tpu_models.html").read()
    for sym in ("iVAE", "jiVAE", "ssiVAE", "ss_reg_iVAE", "VED", "baseVAE"):
        assert f'id="{sym}"' in models, sym
    trainers = open(tmp_path / "pyroved_tpu_trainers.html").read()
    for meth in ("step(", "train(", "run(", "evaluate("):
        assert meth in trainers, meth
