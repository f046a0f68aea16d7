"""External-data handlers: NCBI Datasets API, PubMLST REST API."""
