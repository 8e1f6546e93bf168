from fixtures.gen import Corpus, SIZES, gen_corpus, write_parquet

__all__ = ["Corpus", "SIZES", "gen_corpus", "write_parquet"]
