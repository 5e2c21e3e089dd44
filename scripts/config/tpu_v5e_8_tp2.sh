# Topology preset: single-host 8-chip slice as a (4 data, 2 model) mesh.
# Wide UNet kernels + their adamw moments and EMA leaves channel-shard over
# the 'model' axis (parallel/tp.py, Megatron-style via GSPMD) — use for
# memory-bound configs (256^2 zoo models, remat-off training) where params +
# optimizer state dominate HBM; pure DP (tpu_v5e_8.sh) is faster when memory
# fits.
export MDT_MESH_DATA=4
export MDT_MESH_MODEL=2
export MDT_TP_MIN_FEATURES=256
export MDT_MULTIHOST=False
export MDT_MIXED_PRECISION=bf16
