"""Plugin loading — the ``grn_plugin_register`` analogue.

Reference: ``register`` command lib/proc.c (proc_register →
``grn_plugin_register``), resolution + ``GRN_PLUGIN_INIT/REGISTER/FIN``
protocol lib/plugin.c (path search ``grn_plugin_find_path``, dlopen,
ref-counted re-register is a no-op).

Here a plugin is a Python module: a dotted module name or a ``.py``
file path. Loading imports it once (re-register is a no-op, like the
reference's ref-count) and then calls its ``plugin_register()`` hook if
defined — the GRN_PLUGIN_REGISTER analogue, where the module calls
into the engine's registries (``tokenize.register_tokenizer``,
``search.register_scorer``, ``normalize.register_normalizer``,
``script.register_function``, ``tokenfilters.register_token_filter``,
``cli.register_command`` / ``CommandServer.register_command``).
Modules may instead self-register at import time; both styles work,
mirroring how a .so's GRN_PLUGIN_REGISTER runs right after dlopen.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import threading

_loaded: dict[str, object] = {}
_lock = threading.Lock()

# reference plugin names → the module that provides the same procs
# here (these are built in, so "loading" them is an import + no-op —
# matching the reference's idempotent re-register)
BUILTIN_ALIASES = {
    "token_filters/stem": "groonga_ray.tokenfilters",
    "token_filters/stop_word": "groonga_ray.tokenfilters",
    "tokenizers/regexp": "groonga_ray.tokenize",
    "suggest/suggest": "groonga_ray.pipelines.suggest",
    "functions/vector": "groonga_ray.functions",
    "sharding": "groonga_ray.server",  # logical_* commands are built in
}


def _canonical(name: str) -> str:
    if name.endswith(".py") or os.sep in name:
        return os.path.abspath(name)
    return name


def register(name: str):
    """Load a plugin by dotted module name or ``.py`` path and run its
    ``plugin_register()`` hook. Returns the module. Idempotent: a
    second register of the same plugin returns the cached module
    without re-running the hook (lib/plugin.c ref-count semantics)."""
    name = BUILTIN_ALIASES.get(name, name)
    key = _canonical(name)
    with _lock:
        if key in _loaded:
            return _loaded[key]
        if key.endswith(".py") or os.sep in key:
            modname = "groonga_ray_plugin_" + os.path.splitext(os.path.basename(key))[0]
            spec = importlib.util.spec_from_file_location(modname, key)
            if spec is None or spec.loader is None:
                raise ValueError(f"cannot load plugin: {name}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[modname] = mod
            spec.loader.exec_module(mod)
        else:
            mod = importlib.import_module(key)
        hook = getattr(mod, "plugin_register", None)
        if hook is not None:
            hook()
        _loaded[key] = mod
        return mod


def unregister(name: str) -> bool:
    """Forget a loaded plugin (GRN_PLUGIN_FIN analogue: runs the
    module's ``plugin_unregister()`` hook if defined). Registered
    procs stay registered — same as the reference, where unregister
    only drops the dlopen handle's refcount."""
    key = _canonical(name)
    with _lock:
        mod = _loaded.pop(key, None)
    if mod is None:
        return False
    hook = getattr(mod, "plugin_unregister", None)
    if hook is not None:
        hook()
    return True


def loaded_plugins() -> list[str]:
    return sorted(_loaded)
