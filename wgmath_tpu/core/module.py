"""Kernel-module registry: composable device functions + jittable entry points.

TPU-native replacement for the reference's WGSL shader-composition stack:

- ``Shader`` trait + ``#[derive(Shader)]`` (wgcore/src/shader.rs:65,
  wgcore-derive/src/lib.rs:39) → :class:`KernelModule` dataclass. A module
  declares its name, its transitive dependencies, the *composable* device
  functions it provides (plain Python callables usable both inside Pallas
  kernels and in jnp code — kernels from different subpackages therefore fuse
  into single XLA programs), and its jittable *entry points* (≙ the
  ``ComputePipeline`` struct fields whose names became WGSL entry points).
- naga_oil composition + ``add_composable_module_once`` dedup
  (wgcore/src/composer.rs:22-46) → :func:`compose` — depth-first dependency
  walk with by-name dedup, returning a flat namespace.
- ``Shader::flat_wgsl`` (shader.rs) → :func:`flat_source` — concatenated
  Python source of every function the composed module provides.
- ``test_shader_compilation!`` (wgcore/src/lib.rs:38-83) →
  :func:`compile_check` — jit-lowers every entry point on abstract values,
  proving the full composition traces and lowers for the current backend.
- Registry path override (``ShaderRegistry``, shader.rs:23-53) + hot reload
  (hot_reloading.rs) → :func:`reload` — re-import the defining Python module
  and clear jit caches, the jit-world analog of shader hot reloading.

There is deliberately no macro magic: in JAX, "composition" is function calls
under one jit trace. The registry's job is discovery, dependency dedup,
flat-source dumps for debugging, and compile-checking — the *capabilities*
wgcore provided around naga_oil.
"""

from __future__ import annotations

import dataclasses
import importlib
import inspect
import sys
import threading
from typing import Any, Callable, Iterable, Mapping

import jax


@dataclasses.dataclass(frozen=True)
class EntryPoint:
    """A jittable kernel entry point (≙ one ComputePipeline field).

    ``example_args`` is a zero-arg factory returning abstract or concrete
    arguments; it is only invoked by :func:`compile_check`.
    """

    fn: Callable[..., Any]
    example_args: Callable[[], tuple] | None = None
    static_argnames: tuple[str, ...] = ()


@dataclasses.dataclass(frozen=True)
class KernelModule:
    name: str
    deps: tuple[str, ...] = ()
    provides: Mapping[str, Callable[..., Any]] = dataclasses.field(default_factory=dict)
    entries: Mapping[str, EntryPoint] = dataclasses.field(default_factory=dict)
    doc: str = ""

    def __post_init__(self):
        object.__setattr__(self, "provides", dict(self.provides))
        object.__setattr__(self, "entries", dict(self.entries))


_REGISTRY: dict[str, KernelModule] = {}
_DEFINING_PYMODULE: dict[str, str] = {}
_LOCK = threading.Lock()


def register_module(mod: KernelModule, *, allow_replace: bool = False) -> KernelModule:
    """Register a module once by name (≙ add_composable_module_once).

    Re-registration with identical defining python module is idempotent
    (supports importlib.reload); otherwise it is an error unless
    ``allow_replace`` (≙ ShaderRegistry path override, shader.rs:40-53).
    """
    frame = inspect.stack()[1]
    pymod = frame.frame.f_globals.get("__name__", "?")
    with _LOCK:
        if mod.name in _REGISTRY and not allow_replace:
            if _DEFINING_PYMODULE.get(mod.name) != pymod:
                raise ValueError(
                    f"kernel module {mod.name!r} already registered by "
                    f"{_DEFINING_PYMODULE.get(mod.name)!r}"
                )
        _REGISTRY[mod.name] = mod
        _DEFINING_PYMODULE[mod.name] = pymod
    return mod


def get_module(name: str) -> KernelModule:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown kernel module {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def all_modules() -> dict[str, KernelModule]:
    return dict(_REGISTRY)


def _walk_deps(name: str, seen: set[str], order: list[str]) -> None:
    if name in seen:
        return
    seen.add(name)
    mod = get_module(name)
    for dep in mod.deps:
        _walk_deps(dep, seen, order)
    order.append(name)


def dependency_order(name: str) -> list[str]:
    """Depth-first post-order over transitive deps, deduplicated by name."""
    seen: set[str] = set()
    order: list[str] = []
    _walk_deps(name, seen, order)
    return order


def compose(name: str) -> dict[str, Callable[..., Any]]:
    """Flat namespace of every device function provided by ``name`` and its
    transitive deps. Later (more derived) modules shadow earlier ones, which
    mirrors naga_oil's import resolution order.
    """
    ns: dict[str, Callable[..., Any]] = {}
    for mod_name in dependency_order(name):
        ns.update(get_module(mod_name).provides)
    return ns


def flat_source(name: str) -> str:
    """Concatenated Python source of the composed module (≙ Shader::flat_wgsl)."""
    chunks: list[str] = []
    for mod_name in dependency_order(name):
        mod = get_module(mod_name)
        chunks.append(f"# ===== module: {mod_name} =====")
        for fn_name, fn in mod.provides.items():
            try:
                chunks.append(inspect.getsource(fn))
            except (OSError, TypeError):
                chunks.append(f"# <source unavailable for {fn_name}>")
    return "\n".join(chunks)


def compile_check(name: str, *, entry: str | None = None) -> list[str]:
    """Trace + lower every entry point of ``name`` (≙ test_shader_compilation!).

    Returns the list of entry names checked. Raises on any trace/lower failure.
    """
    mod = get_module(name)
    checked = []
    items = mod.entries.items()
    if entry is not None:
        items = [(entry, mod.entries[entry])]
    for entry_name, ep in items:
        if ep.example_args is None:
            continue
        args = ep.example_args()
        jax.jit(ep.fn, static_argnames=ep.static_argnames).lower(*args)
        checked.append(entry_name)
    return checked


def reload(name: str) -> KernelModule:
    """Re-import the Python module that defined ``name`` and clear jit caches.

    The jit-world analog of shader hot reloading (wgcore/src/hot_reloading.rs:15,
    shader.rs:118-148): edits to kernel source take effect without restarting
    the process. The re-imported module is expected to re-register itself.
    """
    pymod_name = _DEFINING_PYMODULE.get(name)
    if pymod_name is None or pymod_name not in sys.modules:
        raise KeyError(f"module {name!r} has no reloadable defining python module")
    with _LOCK:
        _REGISTRY.pop(name, None)
    importlib.reload(sys.modules[pymod_name])
    jax.clear_caches()
    return get_module(name)


def watch_sources(names: Iterable[str]) -> dict[str, float]:
    """Snapshot mtimes of the files defining ``names`` (≙ Shader::watch_sources).

    Pair with :func:`needs_reload` in a dev loop.
    """
    stamps: dict[str, float] = {}
    for name in names:
        pymod = sys.modules.get(_DEFINING_PYMODULE.get(name, ""), None)
        path = getattr(pymod, "__file__", None)
        if path:
            import os

            stamps[name] = os.stat(path).st_mtime
    return stamps


def needs_reload(stamps: dict[str, float]) -> list[str]:
    """Module names whose defining files changed since ``watch_sources``."""
    import os

    changed = []
    for name, old in stamps.items():
        pymod = sys.modules.get(_DEFINING_PYMODULE.get(name, ""), None)
        path = getattr(pymod, "__file__", None)
        if path and os.stat(path).st_mtime > old:
            changed.append(name)
    return changed
