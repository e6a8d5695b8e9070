from devit_tpu.serving.daemon import (  # noqa: F401
    InferenceEngine,
    MicroBatcher,
    ServeConfig,
    build_engine_from_artifacts,
    build_server,
)
