from mast3r_slam_tpu.data.datasets import (  # noqa: F401
    Intrinsics,
    MonocularDataset,
    load_dataset,
)
