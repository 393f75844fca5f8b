from .media import media_decode, read_media_folder, stream_media_folder
from .parquet import load_table, load_tables, register_views
from .union import read_folder_union_by_name, union_by_name

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_folder_union_by_name",
    "union_by_name",
    "read_media_folder",
    "stream_media_folder",
    "media_decode",
]
