from .tsv import read_annotations_tsv, annotations_to_tsv_lines  # noqa: F401
from .tac import prepare_tac, prepare_tac15  # noqa: F401
from .warc import read_warc, parse_warc, build_warc  # noqa: F401
