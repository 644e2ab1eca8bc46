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


def test_example_notebooks_build_and_validate(tmp_path, monkeypatch):
    """The five reference-notebook mirrors must build as valid nbformat v4
    documents with the expected cell structure (the committed .ipynb files
    additionally carry real-TPU outputs; this pins the generator)."""
    import pathlib
    import nbformat
    ROOT = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(ROOT / "examples" / "notebooks"))
    try:
        import build_notebooks as bn
    finally:
        sys.path.pop(0)
    assert set(bn.NOTEBOOKS) == {
        "pyroVED_examples.ipynb", "VAE_gp.ipynb", "im2spec_VED.ipynb",
        "shiftVAE.ipynb", "pyroVED_examples_C_cont_VAE.ipynb"}
    for name, build in bn.NOTEBOOKS.items():
        nb = build()
        nbformat.validate(nb)
        kinds = [c.cell_type for c in nb.cells]
        assert kinds[0] == "markdown" and "code" in kinds, name
        # every committed mirror exists on disk and is valid too
        on_disk = nbformat.read(
            str(ROOT / "examples" / "notebooks" / name), as_version=4)
        nbformat.validate(on_disk)
