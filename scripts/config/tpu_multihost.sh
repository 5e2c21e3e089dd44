# Topology preset: multi-host pod. Run the launch script on EVERY host
# (e.g. via gcloud compute tpus tpu-vm ssh --worker=all); JAX coordinates
# through jax.distributed.initialize and the mesh spans all hosts, with
# collectives riding ICI within a slice and DCN across slices.
export MDT_MESH_DATA=-1
export MDT_MESH_MODEL=1
export MDT_MULTIHOST=True
export MDT_MIXED_PRECISION=bf16
