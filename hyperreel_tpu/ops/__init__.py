from hyperreel_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_1d,
    grid_sample_3d,
)
from hyperreel_tpu.ops.intersect_math import (
    sort_z,
    sort_with,
    dot,
    intersect_axis_plane,
    intersect_plane,
    intersect_sphere,
    intersect_cylinder,
    intersect_voxel_grid,
    min_sphere_radius,
    min_cylinder_radius,
)
from hyperreel_tpu.ops.render_math import (
    raw2alpha,
    alpha2weights,
    scale_shift_color_all,
    scale_shift_color_one,
    transform_color_all,
    transform_color_one,
)
from hyperreel_tpu.ops.sh import eval_sh_bases, eval_sh
