"""Math layer: Lie-group geometry, spatial algebra, finite differencing.

Mirrors the surface of the reference's dart/math (SURVEY.md section 2.1):
expMap/logMap/AdT/so3 Jacobian family -> lie.py; FiniteDifference ->
finite_difference.py; spatial inertia utilities -> spatial.py.
"""

from nimblephysics_tpu.math.lie import (
    Ad,
    Ad_inv,
    ad,
    ad_apply,
    dAd,
    dad_apply,
    euler_to_matrix,
    exp_map,
    exp_map_rot,
    log_map,
    log_map_rot,
    matrix_to_euler_xyz,
    matrix_to_euler_zyx,
    rp_to_transform,
    skew,
    so3_left_jacobian,
    so3_left_jacobian_inv,
    so3_left_jacobian_time_deriv,
    so3_right_jacobian,
    so3_right_jacobian_inv,
    so3_right_jacobian_time_deriv,
    so3_right_jacobian_time_deriv_deriv,
    transform_inv,
    transform_point,
    transform_vector,
    unskew,
)
from nimblephysics_tpu.math.finite_difference import (
    finite_difference_jacobian,
    ridders_derivative,
)
from nimblephysics_tpu.math.spatial import (
    spatial_inertia_matrix,
    inertia_box,
    inertia_sphere,
    inertia_cylinder,
    inertia_capsule,
    inertia_ellipsoid,
)
from nimblephysics_tpu.math.iksolver import solve_ik
from nimblephysics_tpu.math import splines
