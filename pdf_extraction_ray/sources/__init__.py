from .io import (read_docs, write_docs, dataset_from_text_table,  # noqa: F401
                 read_table_auto, read_orc_dir, write_orc,  # noqa: F401
                 read_ipc_dir, write_ipc)  # noqa: F401
