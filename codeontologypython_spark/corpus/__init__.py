from codeontologypython_spark.corpus.fixtures import (  # noqa: F401
    FIXTURE_REPOS,
    source_files_df,
    source_files_rows,
)
