"""Scene layer: the device-side resource model (the bindless-heap analog),
glTF ingest, processed-asset cache, geometry pools, analytic test scenes."""
