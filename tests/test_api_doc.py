"""docs/API.md config-reference drift gate.

The config dataclass tree IS the public API surface (SURVEY.md section 5.6),
so the reference doc is generated from ``config.py`` by ``docs/gen_api.py``
and this test fails whenever the committed doc no longer matches the source
— the rebuild's answer to the reference's undocumented flag soup (C16).
"""

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen_api():
    spec = importlib.util.spec_from_file_location(
        "gen_api", os.path.join(_REPO, "docs", "gen_api.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_doc_is_current():
    gen = _load_gen_api()
    with open(gen.API_PATH) as fh:
        current = fh.read()
    assert gen.inject(current, gen.render()) == current, (
        "docs/API.md config reference is stale vs config.py — "
        "run: python docs/gen_api.py")


def test_api_doc_covers_every_config_field():
    """Every leaf field of the Config tree appears in the generated block
    in dotted-override form (the form the CLI accepts)."""
    gen = _load_gen_api()
    import dataclasses

    from collaborative_gan_sampling_tpu import config as cfg_mod

    block = gen.render()
    for cname, prefix in gen._PREFIX.items():
        cls = getattr(cfg_mod, cname)
        for f in dataclasses.fields(cls):
            if dataclasses.is_dataclass(f.type) or (
                    isinstance(f.type, str)
                    and f.type in gen._PREFIX):  # subtree link row
                assert f"`{f.name}`" in block
                continue
            assert f"`{prefix}{f.name}`" in block, (
                f"{cname}.{f.name} missing from docs/API.md")


def test_gen_api_check_mode_flags_stale_doc(tmp_path):
    gen = _load_gen_api()
    stale = tmp_path / "API.md"
    stale.write_text("# API\n\nno generated section yet\n")
    orig = gen.API_PATH
    try:
        gen.API_PATH = str(stale)
        assert gen.main(["--check"]) == 1
        assert gen.main([]) == 0  # writes the section
        assert gen.main(["--check"]) == 0  # now current
    finally:
        gen.API_PATH = orig
