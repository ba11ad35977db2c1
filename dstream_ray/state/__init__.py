from dstream_ray.state.checkpoint import CheckpointStore  # noqa: F401
