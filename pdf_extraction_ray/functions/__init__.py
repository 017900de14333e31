from .arrow_utils import as_array, list_offsets, relist  # noqa: F401
