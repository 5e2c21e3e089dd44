# Topology preset: single-host 8-chip v5e slice (replaces
# gpuMulti_config.yaml: distributed_type MULTI_GPU, num_processes 4 —
# on TPU one process drives all local chips over the mesh).
export MDT_MESH_DATA=-1   # all local devices on the data axis
export MDT_MESH_MODEL=1
export MDT_MULTIHOST=False
export MDT_MIXED_PRECISION=bf16
