from .tokenize import classify_spans  # noqa: F401
from .layout import LayoutParser  # noqa: F401
from .reassemble import reassemble_spans  # noqa: F401
