"""API-surface freeze (VERDICT r4 item 8): docs/API.md and the package
must not drift apart, mechanically.

Three directions:
1. every module a section header names imports, and every top-level
   bullet symbol under it resolves in that module,
2. every CLI module that exists is documented in API.md's CLI table
   (and vice versa),
3. the README's stated test count equals the suite's actual test-function
   count (it drifted twice in round 4 before being caught by hand).
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
API_MD = os.path.join(REPO, "docs", "API.md")
README = os.path.join(REPO, "README.md")
CLI_DIR = os.path.join(REPO, "show_and_tell_tpu", "cli")


def _api_text():
    with open(API_MD) as f:
        return f.read()


def _sections():
    """[(module_path, section_body)] from '## Title — `module`' headers."""
    text = _api_text()
    parts = re.split(r"^## ", text, flags=re.M)[1:]
    out = []
    for part in parts:
        header, _, body = part.partition("\n")
        m = re.search(r"`(show_and_tell_tpu[\w.]*)`", header)
        if m:
            out.append((m.group(1), body))
    return out


def test_every_documented_module_imports():
    import importlib

    secs = _sections()
    assert len(secs) >= 12, [s[0] for s in secs]
    for mod, _ in secs:
        importlib.import_module(mod)


def _resolve(root_name: str, dotted: str) -> bool:
    """True iff ``dotted`` resolves as attributes/submodules under the
    module named ``root_name``."""
    import importlib

    try:
        obj = importlib.import_module(root_name)
    except ImportError:
        return False
    for part in dotted.split("."):
        if hasattr(obj, part):
            obj = getattr(obj, part)
            continue
        try:
            obj = importlib.import_module(f"{obj.__name__}.{part}")
        except (ImportError, AttributeError):
            return False
    return True


def test_every_documented_symbol_resolves():
    """Each top-level bullet '- `name...`' under a module section must
    resolve — against the section's module, or (for bullets that name
    their full package-relative path, like `models.encoders` or
    `cli.serve_http`) against the top-level package. `cfg.X` bullets are
    Config fields."""
    import dataclasses

    from show_and_tell_tpu.config import Config

    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    missing = []
    for mod_path, body in _sections():
        for m in re.finditer(r"^- `([A-Za-z_][\w.]*)", body, flags=re.M):
            name = m.group(1)
            if name.startswith("cfg."):
                if name.split(".", 1)[1] not in cfg_fields:
                    missing.append(f"{mod_path}: {name} (no such Config field)")
                continue
            if _resolve(mod_path, name) or _resolve("show_and_tell_tpu", name):
                continue
            missing.append(f"{mod_path}: {name}")
    assert not missing, f"documented but unresolvable: {missing}"


def test_cli_table_matches_cli_package():
    text = _api_text()
    table_rows = set(re.findall(r"^\| `cli\.(\w+)` \|", text, flags=re.M))
    modules = {
        f[:-3]
        for f in os.listdir(CLI_DIR)
        if f.endswith(".py") and f != "__init__.py"
    }
    undocumented = modules - table_rows
    phantom = table_rows - modules
    assert not undocumented, f"CLI modules missing from docs/API.md table: {undocumented}"
    assert not phantom, f"docs/API.md documents CLIs that do not exist: {phantom}"


def test_cli_modules_have_main_entry():
    """Every CLI is runnable: it defines main()/cli_entry() and a
    __main__ guard."""
    for f in sorted(os.listdir(CLI_DIR)):
        if not f.endswith(".py") or f == "__init__.py":
            continue
        with open(os.path.join(CLI_DIR, f)) as fh:
            src = fh.read()
        assert re.search(r"def (main|cli_entry)\(", src), f
        assert '__name__ == "__main__"' in src or "__name__ == '__main__'" in src, f


def test_readme_test_count_matches_suite():
    with open(README) as f:
        readme = f.read()
    m = re.search(r"(\d{2,5})\+? test functions", readme) or re.search(
        r"(\d{2,5})\+? tests", readme
    )
    if not m:
        pytest.skip("README states no test count")
    stated = int(m.group(1))
    actual = 0
    tests_dir = os.path.join(REPO, "tests")
    for f in os.listdir(tests_dir):
        if f.startswith("test_") and f.endswith(".py"):
            with open(os.path.join(tests_dir, f)) as fh:
                src = fh.read()
            actual += len(re.findall(r"^def test_", src, flags=re.M))
            # parametrized cases intentionally NOT expanded: the README
            # count is the function count, stable across param changes
    assert stated == actual, (
        f"README says {stated} tests but tests/ defines {actual} test "
        f"functions — update README.md (this pin exists because the count "
        f"drifted twice in round 4)"
    )
