from gssd_tpu.preprocessing.windowing import (  # noqa: F401
    apply_window,
    ircadb_window,
    normalize01,
    window_and_normalize,
)
from gssd_tpu.preprocessing.mask2bbox import (  # noqa: F401
    mask_slice_to_boxes,
    volume_to_samples,
)
from gssd_tpu.preprocessing.volume_io import (  # noqa: F401
    canonicalize_nii_orientation,
    dump_volume_slices,
    load_nii_volume,
    load_vtk_mesh_points,
)
