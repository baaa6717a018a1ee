"""Declarative frame graph: passes declare reads/writes of named resources;
the graph derives execution order and compiles one jitted frame function.

TPU-native counterpart of the reference render graph
(``src/renderer/render_graph/``): the API shape survives — named transient
resources (mod.rs:422-483), pass builders with read/write declarations
(build.rs:66-208), DFS bake from the node that writes the output
(bake.rs:29-49), and the same construction-time assertions (duplicate node
names build.rs:53-55, duplicate resource edges build.rs:195-198,
read-from-nobody build.rs:96-107). What does NOT survive is everything
Vulkan needed at runtime: barrier synthesis, image-layout tracking, hazard
events (bake.rs:85-197, resources.rs:18-25) — XLA's pure-functional dataflow
makes hazards unrepresentable, and fusion replaces manual scheduling. The
graph therefore *bakes to a function*, once, instead of re-recording command
buffers every frame; per-frame "graph rebuild" cost (the reference rebuilds
its graph per frame, renderer/mod.rs:65-106) becomes zero.

Temporal state (the PrevLight / prev_probe_atlas double-buffer pattern,
old/refrence_mode.slang:61-65) is modeled as *ping-pong resources*: a pass
reads "name@prev" and writes "name"; the compiled step returns the new state
pytree which the caller feeds back (donated under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp


class GraphError(RuntimeError):
    pass


@dataclasses.dataclass
class _Pass:
    name: str
    fn: Callable[..., Dict[str, Any]]
    reads: tuple[str, ...]
    writes: tuple[str, ...]


@dataclasses.dataclass
class _Resource:
    name: str
    shape: tuple | None  # None for imported (shape from value)
    dtype: Any
    temporal: bool  # has a @prev ping-pong slot


class FrameGraph:
    """Build once, compile once, call per frame.

    Example::

        g = FrameGraph()
        g.image("depth", (H, W))
        g.temporal("light", (H, W, 3))            # has light@prev
        g.add_pass("gbuffer", fn, writes=["depth"])
        g.add_pass("shade", fn2, reads=["depth", "light@prev"], writes=["light"])
        step = g.compile(output="light")
        state = g.init_state()
        out, state = step(state, camera=cam, frame_index=0)
    """

    def __init__(self):
        self._resources: Dict[str, _Resource] = {}
        self._passes: List[_Pass] = []
        self._pass_names = set()

    # -- resource declaration (mod.rs:422-483 analog) ----------------------

    def image(self, name: str, shape: Sequence[int], dtype=jnp.float32) -> str:
        """Declare a transient resource (re-created per frame, zeros)."""
        if name in self._resources:
            raise GraphError(f"duplicate resource {name!r}")
        self._resources[name] = _Resource(name, tuple(shape), dtype, temporal=False)
        return name

    buffer = image  # buffers and images are both just arrays here

    def temporal(self, name: str, shape: Sequence[int], dtype=jnp.float32) -> str:
        """Declare a ping-pong resource: passes may read `name@prev` and write
        `name`; the value persists across frames via the state pytree."""
        if name in self._resources:
            raise GraphError(f"duplicate resource {name!r}")
        self._resources[name] = _Resource(name, tuple(shape), dtype, temporal=True)
        return name

    # -- pass declaration (build.rs:66-208 analog) --------------------------

    def add_pass(
        self,
        name: str,
        fn: Callable[..., Dict[str, Any]],
        reads: Sequence[str] = (),
        writes: Sequence[str] = (),
    ) -> None:
        """fn(resources_dict, **constants) -> {written_name: array}.

        Assertions mirror the reference builder: duplicate pass name panics
        (build.rs:53-55); a resource both read and written by the same pass
        must use the @prev slot or be declared in both lists exactly once
        (duplicate edge panic, build.rs:195-198)."""
        if name in self._pass_names:
            raise GraphError(f"duplicate pass name {name!r}")
        self._pass_names.add(name)
        seen = set()
        for r in tuple(reads) + tuple(writes):
            if r in seen:
                raise GraphError(f"pass {name!r} declares resource {r!r} twice")
            seen.add(r)
            base = r.split("@")[0]
            if base not in self._resources:
                raise GraphError(f"pass {name!r} references undeclared resource {r!r}")
            if r.endswith("@prev") and not self._resources[base].temporal:
                raise GraphError(
                    f"pass {name!r} reads {r!r} but {base!r} is not temporal"
                )
        if not writes:
            raise GraphError(f"pass {name!r} writes nothing")
        self._passes.append(_Pass(name, fn, tuple(reads), tuple(writes)))

    # -- bake (bake.rs:29-49 analog) ----------------------------------------

    def _order(self, output: str) -> List[_Pass]:
        writer_of: Dict[str, _Pass] = {}
        for p in self._passes:
            for w in p.writes:
                if w in writer_of:
                    raise GraphError(
                        f"resource {w!r} written by both {writer_of[w].name!r} "
                        f"and {p.name!r}"
                    )
                writer_of[w] = p
        if output not in writer_of:
            raise GraphError(f"no pass writes the requested output {output!r}")

        # DFS from the output writer; @prev reads don't create edges (they
        # come from last frame's state). Reverse + dedup = execution order.
        order: List[_Pass] = []
        visiting: set[str] = set()
        done: set[str] = set()

        def visit(p: _Pass):
            if p.name in done:
                return
            if p.name in visiting:
                raise GraphError(f"cycle through pass {p.name!r}")
            visiting.add(p.name)
            for r in p.reads:
                if r.endswith("@prev"):
                    continue
                w = writer_of.get(r)
                if w is None:
                    raise GraphError(
                        f"pass {p.name!r} reads {r!r} which no pass writes"
                    )
                visit(w)
            visiting.discard(p.name)
            done.add(p.name)
            order.append(p)

        visit(writer_of[output])
        return order

    # -- compile ------------------------------------------------------------

    def init_state(self) -> Dict[str, jax.Array]:
        """Initial temporal-state pytree (all ping-pong buffers, zeroed)."""
        return {
            r.name: jnp.zeros(r.shape, r.dtype)
            for r in self._resources.values()
            if r.temporal
        }

    def compile(
        self, output: str, jit: bool = True, donate_state: bool = True,
        bindings: Any = None,
    ):
        """Bake the execution order and return
        ``step(state, **constants) -> (output_value, new_state)``.

        ``bindings`` is an arbitrary pytree of device arrays (scene, BVH
        tables — the bindless-heap analog) forwarded to every pass whose
        function declares a ``bindings`` parameter. It crosses the jit
        boundary as an *argument*: jit-closures over concrete device arrays
        make every dispatch pay a host round-trip on tunneled runtimes
        (see ops/backend.py)."""
        import inspect

        order = self._order(output)
        wants_bindings = {
            p.name: "bindings" in inspect.signature(p.fn).parameters
            for p in order
        }

        def _check_decl(pass_name: str, name: str, value):
            """Written values must match their declaration — the analog of
            the reference graph materializing resources from declarations
            (render_graph/build.rs:53-107)."""
            r = self._resources[name.split("@")[0]]
            if r.shape is not None and tuple(value.shape) != tuple(r.shape):
                raise GraphError(
                    f"pass {pass_name!r} wrote {name!r} with shape "
                    f"{tuple(value.shape)} but it was declared {r.shape}"
                )
            if r.dtype is not None and value.dtype != jnp.dtype(r.dtype):
                raise GraphError(
                    f"pass {pass_name!r} wrote {name!r} with dtype "
                    f"{value.dtype} but it was declared {jnp.dtype(r.dtype)}"
                )

        def _step(state: Dict[str, jax.Array], bindings_, constants):
            env: Dict[str, Any] = {}
            for r in self._resources.values():
                if r.temporal:
                    env[r.name + "@prev"] = state[r.name]
            for p in order:
                with jax.named_scope(f"pass:{p.name}"):
                    inputs = {r: env[r] for r in p.reads}
                    kw = dict(constants)
                    if wants_bindings[p.name]:
                        kw["bindings"] = bindings_
                    out = p.fn(inputs, **kw)
                if set(out) != set(p.writes):
                    raise GraphError(
                        f"pass {p.name!r} returned {sorted(out)} but declared "
                        f"writes {sorted(p.writes)}"
                    )
                for k, v in out.items():
                    _check_decl(p.name, k, v)
                env.update(out)
            new_state = {
                r.name: env.get(r.name, state[r.name])
                for r in self._resources.values()
                if r.temporal
            }
            return env[output], new_state

        if jit:
            _stepc = jax.jit(_step, donate_argnums=(0,) if donate_state else ())
        else:
            _stepc = _step

        def step(state: Dict[str, jax.Array], **constants):
            return _stepc(state, bindings, constants)

        return step
