# Topology preset: one TPU chip (replaces gpu{0..3}_config.yaml:
# distributed_type 'NO', single process, fp16 AMP -> bf16 on TPU).
export MDT_MESH_DATA=1
export MDT_MESH_MODEL=1
export MDT_MULTIHOST=False
export MDT_MIXED_PRECISION=bf16
