"""Input/output: FASTA/FASTQ parsing, model registry."""
