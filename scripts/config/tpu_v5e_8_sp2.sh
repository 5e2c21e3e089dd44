# Topology preset: single-host 8-chip slice as a (4 data, 2 model) mesh with
# SPATIAL partitioning — activations shard along image HEIGHT over the
# 'model' axis (parallel/sp.py; GSPMD conv halo exchanges), params stay
# replicated. Use when one image's UNet activations outgrow a chip's HBM
# (512^2+, or 256^2 with trajectory capture / remat off); at smaller
# resolutions the halo traffic only adds latency — prefer tpu_v5e_8.sh (DP)
# or tpu_v5e_8_tp2.sh (channel-sharded params). Image height must divide the
# model axis (validated at startup, parallel/sp.py:validate_spatial).
export MDT_MESH_DATA=4
export MDT_MESH_MODEL=2
export MDT_MESH_SPATIAL=True
export MDT_MULTIHOST=False
export MDT_MIXED_PRECISION=bf16
