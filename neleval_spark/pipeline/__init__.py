from .corpus import kb_table, synth_corpus, synth_gold_mentions  # noqa: F401
from .extract import extract_text, with_extracted_text  # noqa: F401
from .kb import build_kb_profiles  # noqa: F401
from .run import run_pipeline  # noqa: F401
