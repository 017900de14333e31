from .manifest import PartitionManifest, read_manifests, write_manifest  # noqa: F401
