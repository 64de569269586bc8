"""The migration guide's API surface actually exists.

docs/migration.md tells reference users where every symbol lives; this
test imports each `nsc.<module>.<name>` the guide mentions so the doc
cannot rot against the package. (Reference parity of behavior is covered
elsewhere — tests/test_reference_parity.py and per-module suites.)
"""

import importlib
import re
from pathlib import Path

import pytest

GUIDE = Path(__file__).resolve().parent.parent / "docs" / "migration.md"

# `nsc.a.b.Name` or `nsc.a.b.func_name` — the guide's convention for our
# symbols. Trailing `.*` rows (wildcard modules) are checked as modules.
PATTERN = re.compile(r"`nsc\.([A-Za-z0-9_.]+?)(\.\*)?`")


def _targets():
    text = GUIDE.read_text()
    seen = set()
    for m in PATTERN.finditer(text):
        dotted, wildcard = m.group(1), m.group(2)
        if (dotted, bool(wildcard)) not in seen:
            seen.add((dotted, bool(wildcard)))
            yield dotted, bool(wildcard)


TARGETS = sorted(_targets())


def test_guide_found_symbols():
    assert len(TARGETS) >= 40, "migration guide parse found too few symbols"


@pytest.mark.parametrize("dotted,wildcard", TARGETS,
                         ids=[t[0] for t in TARGETS])
def test_symbol_exists(dotted, wildcard):
    root = "neural_spectral_codec_tpu"
    if wildcard:
        importlib.import_module(f"{root}.{dotted}")
        return
    parts = dotted.split(".")
    # longest importable module prefix, then getattr the rest
    for i in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(f"{root}." + ".".join(parts[:i]))
        except ImportError:
            continue
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return
    raise AssertionError(f"cannot resolve nsc.{dotted}")
