"""``python -m dstream_ray`` — the engine CLI (run/init/plan/status/destroy)."""

from dstream_ray.pipelines.streaming import main

if __name__ == "__main__":
    main()
