"""dryrun_multichip's incremental certification cache (round-5): keys
cover the shared core source, the product's own module, the mesh size and
the config fingerprint; entries survive a round trip and stale keys are
never honored."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_under_test", os.path.join(REPO, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


g = _load_graft()


def test_key_depends_on_core_source(tmp_path, monkeypatch):
    """Touching a core module's bytes changes every product key."""
    k0 = g._product_key("snowball", 8, "cfg")
    # redirect the package root to a copy with one mutated core file
    import shutil
    pkg = tmp_path / "hullwhite_tpu"
    shutil.copytree(os.path.join(REPO, "hullwhite_tpu"), pkg)
    (pkg / "config.py").write_bytes(
        (pkg / "config.py").read_bytes() + b"\n# mutated\n")
    monkeypatch.setattr(g, "_PKG", str(pkg))
    assert g._product_key("snowball", 8, "cfg") != k0


def test_key_depends_on_own_module_only_for_that_product(tmp_path,
                                                         monkeypatch):
    """Touching snowball.py re-keys the snowball products but not the
    chooser — the point of incremental certification."""
    k_snow0 = g._product_key("snowball", 8, "cfg")
    k_choo0 = g._product_key("chooser_cap", 8, "cfg")
    import shutil
    pkg = tmp_path / "hullwhite_tpu"
    shutil.copytree(os.path.join(REPO, "hullwhite_tpu"), pkg)
    (pkg / "snowball.py").write_bytes(
        (pkg / "snowball.py").read_bytes() + b"\n# mutated\n")
    monkeypatch.setattr(g, "_PKG", str(pkg))
    assert g._product_key("snowball", 8, "cfg") != k_snow0
    assert g._product_key("chooser_cap", 8, "cfg") == k_choo0


def test_key_depends_on_mesh_and_config():
    assert g._product_key("tarn", 8, "a") != g._product_key("tarn", 16, "a")
    assert g._product_key("tarn", 8, "a") != g._product_key("tarn", 8, "b")


def test_every_tail_product_has_an_explicit_module_map():
    """The tail list in dryrun_multichip and _PRODUCT_MODULES must stay
    in sync — an unknown name silently degrades to whole-package hashing
    (correct but never cache-hits across code changes)."""
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    import re
    tail_block = src[src.index("tail = ["):src.index("cfg_repr = repr(cfg)")]
    names = re.findall(r'^\s+\("([a-z0-9_]+)",', tail_block, re.M)
    assert len(names) > 30
    missing = [n for n in names if n not in g._PRODUCT_MODULES]
    assert not missing, missing
    # and the mapped module files all exist
    for mods in g._PRODUCT_MODULES.values():
        for m in mods:
            assert os.path.exists(os.path.join(REPO, "hullwhite_tpu", m)), m


def test_cache_roundtrip_and_stale_key(tmp_path, monkeypatch):
    monkeypatch.setattr(g, "_CACHE_PATH", str(tmp_path / "cache.json"))
    cache = {"snowball": {"key": "k1", "when": "2026-08-20T00:00:00",
                          "deltas": {"snowball": 0.0}}}
    g._cache_store(cache)
    assert g._cache_load() == cache
    # a corrupt file loads as empty, never raises
    (tmp_path / "cache.json").write_text("{not json")
    assert g._cache_load() == {}
