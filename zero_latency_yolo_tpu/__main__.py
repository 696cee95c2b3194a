"""`python -m zero_latency_yolo_tpu` starts the detection server."""

from .runtime.server import main

if __name__ == "__main__":
    main()
