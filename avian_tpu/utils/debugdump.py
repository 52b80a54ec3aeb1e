"""Schedule-graph dumps — the TPU-native counterpart of the reference's
``debugdump_2d.rs`` / ``debugdump_3d.rs`` examples, which print the Bevy
``PhysicsSchedule``/``SubstepSchedule`` system graph as Graphviz DOT
(via ``bevy_mod_debugdump``).

avian_tpu's "schedule" is the fixed stage pipeline of
``pipeline/step.py::physics_step`` (SURVEY.md §3.1), so the DOT graph is
derived from the same static config that gates each stage — what you see
is exactly what gets traced. ``jaxpr_summary`` goes one level deeper and
reports what XLA actually receives: primitive counts of the traced step,
the closest analogue of dumping the post-build system graph.
"""

from collections import Counter

import jax


def schedule_stages(config, has_joints=True, custom_joints=False,
                    hooks=False, dim2=False):
    """The ordered stage list of one physics step, as (name, group) pairs.

    Mirrors ``physics_step``'s actual staging including config-gated
    stages (``swept_ccd``, ``nan_guard``) — keep in sync with
    ``pipeline/step.py`` (the 2D profile ``dim2/step.py`` stages the same
    way minus gyroscopic terms).
    """
    stages = [
        ("update_aabbs", "broad phase"),
        ("broad_phase (uniform grid)", "broad phase"),
    ]
    if hooks:
        stages.append(("hooks.filter_pairs", "broad phase"))
    stages.append(("narrow_phase (manifolds + matching)", "narrow phase"))
    if hooks:
        stages.append(("hooks.modify_contacts", "narrow phase"))
    stages += [
        ("prepare_solver_bodies", "prepare"),
        ("pre_process_velocity_increments", "prepare"),
        ("prepare_constraints (+coloring)", "prepare"),
    ]
    if has_joints:
        stages.append(("prepare_joints (XPBD)", "prepare"))
    if custom_joints:
        stages.append(("custom_joints.prepare", "prepare"))
    sub = [
        ("integrate_velocities", "substep loop"),
        ("clamp_velocities", "substep loop"),
        ("warm_start", "substep loop"),
        ("solve_pass (bias)", "substep loop"),
        ("integrate_positions", "substep loop"),
        ("solve_pass (relax)", "substep loop"),
    ]
    if has_joints or custom_joints:
        sub.append(("solve_position_constraints (XPBD)", "substep loop"))
    stages += sub
    if getattr(config, "swept_ccd", False):
        stages.append(("solve_swept_ccd", "finalize"))
    stages += [
        ("solve_restitution", "finalize"),
        ("store_impulses / store_joint_forces", "finalize"),
        ("writeback + clear forces", "finalize"),
        ("update_sleeping (islands)", "finalize"),
    ]
    if getattr(config, "nan_guard", False):
        stages.append(("nan_quarantine", "finalize"))
    return stages


def schedule_dot(config, **kw) -> str:
    """Graphviz DOT of the physics step's stage graph (the counterpart of
    ``bevy_mod_debugdump::schedule_graph_dot``)."""
    stages = schedule_stages(config, **kw)
    lines = [
        "digraph physics_step {",
        "  rankdir=TB;",
        '  node [shape=box, fontname="monospace"];',
    ]
    groups = {}
    for i, (name, group) in enumerate(stages):
        groups.setdefault(group, []).append(i)
        lines.append(f'  n{i} [label="{name}"];')
    for gi, (group, idxs) in enumerate(groups.items()):
        label = group
        if group == "substep loop":
            label = f"substep loop (lax.scan x{config.substeps})"
        lines.append(f"  subgraph cluster_{gi} {{")
        lines.append(f'    label="{label}";')
        for i in idxs:
            lines.append(f"    n{i};")
        lines.append("  }")
    for i in range(len(stages) - 1):
        lines.append(f"  n{i} -> n{i + 1};")
    lines.append("}")
    return "\n".join(lines)


def jaxpr_summary(world, config, step_fn=None, top=12) -> str:
    """Primitive counts of the traced step — what XLA actually compiles.

    ``step_fn(world) -> world`` defaults to the 3D ``physics_step``.
    """
    if step_fn is None:
        from avian_tpu.pipeline.step import physics_step

        def step_fn(w):
            return physics_step(w, config)

    jaxpr = jax.make_jaxpr(step_fn)(world)

    counts = Counter()

    def subjaxprs(v):
        # Duck-typed: Jaxpr has .eqns, ClosedJaxpr wraps one in .jaxpr;
        # cond carries a tuple of branches.
        if hasattr(v, "eqns"):
            yield v
        elif hasattr(v, "jaxpr"):
            yield v.jaxpr
        elif isinstance(v, (list, tuple)):
            for x in v:
                yield from subjaxprs(x)

    def walk(jx):
        for eqn in jx.eqns:
            counts[eqn.primitive.name] += 1
            for v in eqn.params.values():
                for sub in subjaxprs(v):
                    walk(sub)

    walk(jaxpr.jaxpr)
    total = sum(counts.values())
    out = [f"traced physics_step: {total} primitive applications"]
    for name, n in counts.most_common(top):
        out.append(f"  {name:24s} {n}")
    return "\n".join(out)
