"""Strip the TPU-plugin site dir from import paths (stdlib-only module).

The axon plugin ships a ``sitecustomize.py`` that registers its PJRT
backend at every interpreter start; with the device tunnel dead that
registration makes jax hang at backend init, and the ``JAX_PLATFORMS=cpu``
env var alone does NOT prevent it (measured — only
``jax.config.update("jax_platforms", "cpu")`` after import, or an absent
plugin, does). Subprocesses therefore need the plugin dir removed from
``PYTHONPATH`` before spawn. One helper, shared by ``tests/conftest.py``
and ``__graft_entry__.dryrun_multichip`` so the path-component matching
rule cannot drift between them (it already had to be fixed in lockstep
once: substring -> component match). DESIGN.md §7 has the full story.

This module must stay importable without jax (``liftreg_tpu/__init__.py``
is docstring-only).
"""
from __future__ import annotations

import os

_PLUGIN_DIR_NAMES = (".axon_site", "axon_site")


def is_plugin_path(p: str) -> bool:
    """True if path ``p`` is (inside) the TPU-plugin site dir — matched by
    path component, not substring, so unrelated paths that merely contain
    the word are kept."""
    return any(c in _PLUGIN_DIR_NAMES for c in p.split(os.sep))


def strip_plugin_paths(paths):
    """Filter plugin dirs out of a list of import paths. Empty components
    are kept (in PYTHONPATH semantics they mean the cwd)."""
    return [p for p in paths if not is_plugin_path(p)]


def pythonpath_without_plugin(environ=None) -> str:
    """The current PYTHONPATH with the plugin dir removed."""
    environ = os.environ if environ is None else environ
    return os.pathsep.join(
        strip_plugin_paths(environ.get("PYTHONPATH", "").split(os.pathsep)))
