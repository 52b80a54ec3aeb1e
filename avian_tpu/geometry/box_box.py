"""Box-box contact manifolds: SAT over 15 axes + incident-face clipping.

This replaces Parry's cuboid-cuboid PolygonPolygon dispatcher used by the
reference (``src/collision/collider/parry/contact_query.rs:156-261``). The
algorithm is the classic OBB SAT (6 face axes + 9 edge-cross axes) with
Sutherland-Hodgman clipping of the incident face against the reference face's
side planes, then reduction to a 4-point manifold — the same scheme as
Box2D/Jolt, but written branch-free over fixed-size arrays so it vectorizes
over the whole pair buffer on the VPU.

Everything is computed in box A's local frame; outputs are world-space.
"""

import jax
import jax.numpy as jnp

from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec

_EDGE_BIAS_REL = 0.05
_EDGE_BIAS_ABS = 1e-4


def _signp(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)


def box_box(pa, qa, prm_a, pb, qb, prm_b):
    from avian_tpu.geometry.narrowphase import Manifold, _empty

    ha = prm_a[:3]
    hb = prm_b[:3]

    # B's rotation and center in A's frame.
    q_rel = quat_m.mul(quat_m.conj(qa), qb)
    rb = quat_m.to_mat3(q_rel)          # columns = B's axes in A frame
    t = quat_m.rotate_inv(qa, pb - pa)  # B's center in A frame

    abs_rb = jnp.abs(rb) + 1e-6  # epsilon vs near-parallel axes (Ericson)

    # --- Face axes of A: L = e_i --------------------------------------
    sep_a = jnp.abs(t) - (ha + vec.mv3(abs_rb, hb))  # [3]

    # --- Face axes of B: L = b_j --------------------------------------
    t_b = vec.mtv3(rb, t)
    sep_b = jnp.abs(t_b) - (vec.mtv3(abs_rb, ha) + hb)  # [3]

    # --- Edge axes: L = e_i x b_j -------------------------------------
    # Build all 9 cross axes. e_i x b_j has a closed form from rb columns.
    eye = jnp.eye(3, dtype=jnp.float32)
    axes_e = jnp.cross(
        eye[:, None, :], rb.T[None, :, :]
    )  # [i, j, 3] = e_i x b_j
    axes_e = axes_e.reshape(9, 3)
    len_e = vec.length(axes_e)
    valid_e = len_e > 1e-6
    axes_en = axes_e / jnp.maximum(len_e, 1e-6)[:, None]
    proj_a = jnp.sum(jnp.abs(axes_en) * ha[None, :], axis=-1)  # [9]
    axes_dot_b = jnp.sum(axes_en[:, :, None] * rb[None, :, :], axis=1)  # [9,3]
    proj_b = jnp.sum(jnp.abs(axes_dot_b) * hb[None, :], axis=-1)  # [9]
    sep_e = jnp.abs(jnp.sum(axes_en * t[None, :], axis=-1)) - (proj_a + proj_b)
    sep_e = jnp.where(valid_e, sep_e, -1e9)

    # --- SAT choice ----------------------------------------------------
    best_face_a = jnp.max(sep_a)
    best_face_b = jnp.max(sep_b)
    best_face = jnp.maximum(best_face_a, best_face_b)
    best_edge = jnp.max(sep_e)

    use_edge = best_edge > best_face + jnp.maximum(
        _EDGE_BIAS_REL * jnp.abs(best_face), _EDGE_BIAS_ABS
    )
    ref_on_a = best_face_a >= best_face_b - 1e-6

    # ====================== FACE MANIFOLD ==============================
    # Select the reference frame's inputs once, then clip once (halves the
    # face-manifold cost versus computing both orientations).
    rb_T = rb.T
    t_in_b = -vec.mtv3(rb, t)
    r_in = jnp.where(ref_on_a, rb, rb_T)
    t_in = jnp.where(ref_on_a, t, t_in_b)
    h_ref = jnp.where(ref_on_a, ha, hb)
    h_inc = jnp.where(ref_on_a, hb, ha)
    axis_idx = jnp.where(ref_on_a, jnp.argmax(sep_a), jnp.argmax(sep_b))
    pts, ref_pts, seps, fids, count, n_local = _face_manifold(
        r_in, t_in, h_ref, h_inc, axis_idx
    )

    # To world. For ref_on_a: local frame is A's. Otherwise B's.
    rot_q = jnp.where(ref_on_a, qa, qb)
    origin = jnp.where(ref_on_a, pa, pb)
    pts_w = origin + quat_m.rotate(rot_q[None, :], pts)
    ref_w = origin + quat_m.rotate(rot_q[None, :], ref_pts)
    n_w = quat_m.rotate(rot_q, n_local)
    # Normal must point from A to B. With ref on A it points A->B already
    # (toward the incident box); with ref on B it points B->A, so flip —
    # and the clipped points lie on A (incident), ref points on B.
    normal_face = jnp.where(ref_on_a, n_w, -n_w)
    point_a_face = jnp.where(ref_on_a, ref_w, pts_w)
    point_b_face = jnp.where(ref_on_a, pts_w, ref_w)
    fid_face = jnp.where(ref_on_a, fids, fids + 64)

    # ====================== EDGE MANIFOLD ==============================
    e_idx = jnp.argmax(sep_e)
    i_idx = e_idx // 3
    j_idx = e_idx % 3
    axis = axes_en[e_idx]
    n_e = axis * _signp(jnp.dot(axis, t))  # toward B, in A frame

    # Supporting edge on A: maximize n over A's box, free along e_i.
    s_a = _signp(n_e) * ha
    ca = jnp.where(jnp.arange(3) == i_idx, 0.0, s_a)
    da = eye[i_idx]
    ha_i = ha[i_idx]

    # Supporting edge on B: minimize n, free along b_j.
    n_in_b = vec.mtv3(rb, n_e)
    s_b = -_signp(n_in_b) * hb
    cb_local = jnp.where(jnp.arange(3) == j_idx, 0.0, s_b)
    cb = t + vec.mv3(rb, cb_local)
    db = rb[:, j_idx]
    hb_j = hb[j_idx]

    from avian_tpu.geometry.narrowphase import _closest_segment_segment

    s_par, t_par = _closest_segment_segment(ca, da, ha_i, cb, db, hb_j)
    pa_e = ca + da * s_par
    pb_e = cb + db * t_par
    sep_edge_pt = jnp.dot(pb_e - pa_e, n_e)

    # --------------------- select + assemble ---------------------------
    m = _empty()
    edge_manifold = Manifold(
        normal=quat_m.rotate(qa, n_e),
        point_a=m.point_a.at[0].set(pa + quat_m.rotate(qa, pa_e)),
        point_b=m.point_b.at[0].set(pa + quat_m.rotate(qa, pb_e)),
        separation=m.separation.at[0].set(sep_edge_pt),
        feature_id=m.feature_id.at[0].set(128 + e_idx),
        count=jnp.asarray(1, jnp.int32),
    )
    face_manifold = Manifold(
        normal=normal_face,
        point_a=point_a_face,
        point_b=point_b_face,
        separation=seps,
        feature_id=fid_face,
        count=count,
    )
    return jax.tree.map(
        lambda e, f: jnp.where(use_edge, e, f), edge_manifold, face_manifold
    )


def _face_manifold(r_inc, t_inc, h_ref, h_inc, axis_idx):
    """Clip the incident face of the box (rotation ``r_inc``, center
    ``t_inc``, half-extents ``h_inc``) against the reference box's face
    ``axis_idx`` (half-extents ``h_ref``, identity pose).

    Works entirely in the reference face's (u, v, w) coordinates — the clip
    planes are axis-aligned there, so inside tests are component compares
    and intersections are 1D lerps. This matters: this function runs for
    every box-box pair in the buffer.

    Returns (points_on_incident[4,3], points_on_ref[4,3], separations[4],
    feature_ids[4], count, ref_normal[3]) in the reference box's frame.
    """
    eye = jnp.eye(3, dtype=jnp.float32)
    sign = _signp(t_inc[axis_idx])
    n_ref = eye[axis_idx] * sign  # outward, toward incident box
    h_axis = h_ref[axis_idx]
    u_r = (axis_idx + 1) % 3
    v_r = (axis_idx + 2) % 3
    hu_r = h_ref[u_r]
    hv_r = h_ref[v_r]

    # Incident face: the face of inc whose outward normal is most
    # anti-parallel to n_ref.
    dots = vec.mtv3(r_inc, n_ref)  # [3] = dot(n_ref, b_j)
    j = jnp.argmax(jnp.abs(dots))
    sj = -_signp(dots[j])
    ju = (j + 1) % 3
    jv = (j + 2) % 3
    face_center = t_inc + sj * h_inc[j] * r_inc[:, j]
    b_u = r_inc[:, ju] * h_inc[ju]
    b_v = r_inc[:, jv] * h_inc[jv]
    # Quad loop order: (+u,+v) -> (-u,+v) -> (-u,-v) -> (+u,-v).
    quad_signs = jnp.asarray(
        [[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], jnp.float32
    )
    verts4 = (
        face_center[None, :]
        + quad_signs[:, 0:1] * b_u[None, :]
        + quad_signs[:, 1:2] * b_v[None, :]
    )
    # Project to face coordinates: (u, v, w) = components (u_r, v_r, axis).
    q4 = jnp.stack(
        [verts4[:, u_r], verts4[:, v_r], verts4[:, axis_idx] * sign], axis=-1
    )

    # Fixed 8-slot polygon in (u, v, w); pad with repeats of vertex 0 (a
    # degenerate ring keeps Sutherland-Hodgman correct without a count).
    P = 8
    q = jnp.concatenate([q4, jnp.broadcast_to(q4[0:1], (4, 3))], axis=0)
    fids = jnp.zeros((P,), jnp.int32).at[:4].set(
        jnp.arange(4, dtype=jnp.int32) + 4 * j.astype(jnp.int32)
    )
    count = jnp.asarray(4, jnp.int32)

    # Clip against u <= hu, -u <= hu, v <= hv, -v <= hv.
    for k, (axis2, s2, lim) in enumerate(
        [(0, 1.0, hu_r), (0, -1.0, hu_r), (1, 1.0, hv_r), (1, -1.0, hv_r)]
    ):
        q, fids, count = _clip_axis(q, fids, count, axis2, s2, lim, 32 + 8 * k)

    # Separations above the reference face = w - h.
    valid = jnp.arange(P) < count
    seps = jnp.where(valid, q[:, 2] - h_axis, 1e9)
    uv = q[:, :2]

    # Reduce to 4 points: deepest, farthest, max/min signed 2D area.
    idx0 = jnp.argmin(seps)
    p0 = uv[idx0]
    d2 = jnp.where(valid, jnp.sum((uv - p0) ** 2, axis=-1), -1.0)
    d2 = d2.at[idx0].set(-1.0)
    idx1 = jnp.argmax(d2)
    e1 = uv[idx1] - p0
    cr = e1[0] * (uv[:, 1] - p0[1]) - e1[1] * (uv[:, 0] - p0[0])
    cr_mask = jnp.where(valid, cr, 0.0)
    cr_mask = cr_mask.at[idx0].set(0.0).at[idx1].set(0.0)
    idx2 = jnp.argmax(cr_mask)
    idx3 = jnp.argmin(cr_mask)

    sel = jnp.stack([idx0, idx1, idx2, idx3])
    first = jnp.asarray(
        [
            True,
            sel[1] != sel[0],
            (sel[2] != sel[0]) & (sel[2] != sel[1]),
            (sel[3] != sel[0]) & (sel[3] != sel[1]) & (sel[3] != sel[2]),
        ]
    )
    ok = first & valid[sel]
    out_q = q[sel]
    out_seps = jnp.where(ok, seps[sel], 1e9)
    out_fids = jnp.where(ok, fids[sel], 0)
    out_count = jnp.sum(ok.astype(jnp.int32))

    # Back to 3D in the reference frame.
    out_pts = (
        out_q[:, 0:1] * eye[u_r][None, :]
        + out_q[:, 1:2] * eye[v_r][None, :]
        + (out_q[:, 2:3] * sign) * eye[axis_idx][None, :]
    )
    ref_pts = out_pts - n_ref[None, :] * out_seps[:, None].clip(-1e8, 1e8)
    return out_pts, ref_pts, out_seps, out_fids, out_count, n_ref


def _clip_axis(q, fids, count, axis2, s2, lim, fid_base):
    """Sutherland-Hodgman clip of the (u, v, w) polygon against
    ``s2 * q[axis2] <= lim``. Each input edge emits up to 2 points into a
    16-slot buffer; compaction is one batched small-axis sort."""
    P = q.shape[0]
    idx = jnp.arange(P)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = q
    nxt_q = q[nxt]
    d_cur = s2 * cur[:, axis2] - lim
    d_nxt = s2 * nxt_q[:, axis2] - lim
    in_cur = d_cur <= 0.0
    edge_valid = idx < count
    crossing = edge_valid & (in_cur != (d_nxt <= 0.0))

    t = d_cur / jnp.where(jnp.abs(d_cur - d_nxt) > 1e-12, d_cur - d_nxt, 1e-12)
    inter = cur + (nxt_q - cur) * jnp.clip(t, 0.0, 1.0)[:, None]

    emit_q = jnp.concatenate([cur, inter], axis=0)          # [16, 3]
    emit_f = jnp.concatenate([fids, fid_base + idx], axis=0)
    emit_ok = jnp.concatenate([edge_valid & in_cur, crossing])
    # Ring-order key: even slots for kept vertices, odd for intersections;
    # invalid entries sort to the back.
    order_key = jnp.concatenate([2 * idx, 2 * idx + 1])
    key = jnp.where(emit_ok, order_key, 2 * P + order_key)
    _, qq0, qq1, qq2, ff, ok = jax.lax.sort(
        [key, emit_q[:, 0], emit_q[:, 1], emit_q[:, 2], emit_f,
         emit_ok.astype(jnp.int32)],
        num_keys=1,
    )
    out_q = jnp.stack([qq0[:P], qq1[:P], qq2[:P]], axis=-1)
    out_count = jnp.minimum(jnp.sum(emit_ok.astype(jnp.int32)), P)
    # Degenerate-pad the ring with the first vertex so later clips are safe.
    pad = jnp.arange(P) >= out_count
    out_q = jnp.where(pad[:, None], out_q[0:1], out_q)
    return out_q, ff[:P], out_count
