"""docs/API.md stays honest: every dotted symbol and CLI subcommand it
documents must exist in the package.

The API reference (docs/API.md) is the user-facing contract map; a rename
in the package that forgets the doc would ship a reference to a symbol
that does not exist.  This test resolves every backticked dotted
identifier whose first segment names a known submodule alias, and every
subcommand in the "CLI map" section, against the real package.  Bare
names (table entries, prose) are intentionally not checked — the dotted
references plus the CLI map cover every module's surface.
"""

import importlib
import pathlib
import re
import types

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "API.md"

# first-segment alias -> importable module, as used throughout the doc
ALIASES = {
    "core": "prdisagg_tpu.core",
    "download": "prdisagg_tpu.data.download",
    "ingest": "prdisagg_tpu.data.ingest",
    "netcdf_io": "prdisagg_tpu.data.netcdf_io",
    "indices": "prdisagg_tpu.data.indices",
    "native": "prdisagg_tpu.data.native",
    "sampler": "prdisagg_tpu.data.sampler",
    "synthetic": "prdisagg_tpu.data.synthetic",
    "models": "prdisagg_tpu.models",
    "ops": "prdisagg_tpu.ops",
    "crps": "prdisagg_tpu.eval.crps",
    "lsd": "prdisagg_tpu.eval.lsd",
    "parity": "prdisagg_tpu.eval.parity",
    "evaluate": "prdisagg_tpu.eval.evaluate",
    "pipeline": "prdisagg_tpu.baselines.rainfarm.pipeline",
    "mesh": "prdisagg_tpu.parallel.mesh",
    "distributed": "prdisagg_tpu.parallel.distributed",
    "watchdog": "prdisagg_tpu.utils.watchdog",
    "stagecache": "prdisagg_tpu.utils.stagecache",
    "profiling": "prdisagg_tpu.utils.profiling",
    "tb": "prdisagg_tpu.utils.tb",
    "rng": "prdisagg_tpu.utils.rng",
    "utils": "prdisagg_tpu.utils",
}
# rainfarm section's `core.*` rows mean baselines.rainfarm.core, but
# `core.config` means prdisagg_tpu.core.config — disambiguate by 2nd seg
RAINFARM_CORE = "prdisagg_tpu.baselines.rainfarm.core"

DOTTED = re.compile(r"`([A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)+)`")


def _resolve(token):
    parts = token.split(".")
    if parts[0] == "core" and parts[1] != "config":
        mod_path, rest = RAINFARM_CORE, parts[1:]
    else:
        mod_path, rest = ALIASES[parts[0]], parts[1:]
    obj = importlib.import_module(mod_path)
    for name in rest:
        try:
            obj = getattr(obj, name)
        except AttributeError:
            # submodule not imported by the parent's __init__
            if not hasattr(obj, "__path__"):
                return False
            try:
                obj = importlib.import_module(f"{mod_path}.{name}")
            except ImportError:
                return False
        # keep mod_path in lockstep with obj so a missing attribute UNDER a
        # getattr-reached submodule reports as a missing symbol, not an
        # uncaught ModuleNotFoundError on a wrong dotted path (ADVICE r4)
        if isinstance(obj, types.ModuleType):
            mod_path = obj.__name__
    return True


def test_documented_dotted_symbols_exist():
    text = DOC.read_text()
    tokens = {t for t in DOTTED.findall(text) if t.split(".")[0] in ALIASES}
    assert len(tokens) >= 15, "extractor regressed; expected many symbols"
    missing = sorted(t for t in tokens if not _resolve(t))
    assert not missing, f"docs/API.md documents nonexistent symbols: {missing}"


def test_documented_cli_subcommands_exist():
    from prdisagg_tpu.cli import build_parser

    text = DOC.read_text()
    cli_section = text[text.index("## CLI map"):]
    # subcommand tokens: backticked kebab-case words (flags start with -).
    # Slash-joined compound entries like `rainfarm-calibrate/generate/crps`
    # expand via the first token's prefix (ADVICE r4: the old regex skipped
    # them entirely, leaving those subcommands unguarded against renames).
    cmds = set()
    for tok in re.findall(r"`([a-z][a-z0-9/-]*)`", cli_section):
        if tok.startswith("-"):
            continue
        parts = tok.split("/")
        cmds.add(parts[0])
        prefix = parts[0].rsplit("-", 1)[0] + "-" if "-" in parts[0] else ""
        cmds.update(prefix + p for p in parts[1:])
    assert "train" in cmds and "serve" in cmds
    sub = next(a for a in build_parser()._actions
               if hasattr(a, "choices") and a.choices)
    registered = set(sub.choices)
    missing = sorted(cmds - registered)
    assert not missing, f"docs/API.md CLI map lists unknown commands: {missing}"
