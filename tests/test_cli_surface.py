"""Pin the CLI's observable option surface.

The command tree and option names are parity-critical contract
(reference: src/xspect/main.py); this guards them against drift when
the implementation is restructured (shared option factories etc.).
"""

import pytest
from click.testing import CliRunner

from xspect2_tpu.main import cli

SURFACE = {
    (): ["web", "all", "models", "classify", "filter"],
    ("models",): ["download", "import", "list", "train"],
    ("models", "train"): ["ncbi", "directory", "mlst"],
    ("classify",): ["genus", "species", "mlst"],
    ("filter",): ["genus", "species"],
}

OPTIONS = {
    ("all",): ["-g", "--genus", "-i", "--input-path", "-o", "--output-dir",
               "-t", "--threshold", "--sparse-sampling-step",
               "-n", "--display-names", "-v", "--validation"],
    ("models", "train", "ncbi"): ["-g", "--genus", "--svm_steps", "--author",
                                  "--author-email", "--min-n50",
                                  "--include-atypical", "--exclude-atypical",
                                  "--allow-inconclusive", "--allow-candidatus",
                                  "--allow-sp"],
    ("models", "train", "directory"): ["-g", "--genus", "-i", "--input-path",
                                       "--meta", "--svm-steps", "--author",
                                       "--author-email"],
    ("models", "train", "mlst"): ["--organism", "--mlst-scheme", "--author",
                                  "--author-email"],
    ("classify", "genus"): ["-g", "--genus", "-i", "--input-path",
                            "-o", "--output-path", "--sparse-sampling-step"],
    ("classify", "species"): ["-g", "--genus", "-i", "--input-path",
                              "-o", "--output-path", "--sparse-sampling-step",
                              "-n", "--display-names", "-v", "--validation",
                              "--exclude-species"],
    ("classify", "mlst"): ["-i", "--input-path", "--organism", "--mlst-scheme",
                           "-o", "--output-path", "-l", "--limit"],
    ("filter", "genus"): ["-g", "--genus", "-i", "--input-path",
                          "-o", "--output-path",
                          "--classification-output-path",
                          "-t", "--threshold", "--sparse-sampling-step"],
    ("filter", "species"): ["-g", "--genus", "-s", "--species",
                            "-i", "--input-path", "-o", "--output-path",
                            "--classification-output-path",
                            "-t", "--threshold", "--sparse-sampling-step"],
}


@pytest.mark.parametrize("path,subcommands", sorted(SURFACE.items()))
def test_command_tree(path, subcommands):
    result = CliRunner().invoke(cli, [*path, "--help"])
    assert result.exit_code == 0, result.output
    for sub in subcommands:
        assert f"\n  {sub}" in result.output, f"missing subcommand {sub}"


@pytest.mark.parametrize("path,options", sorted(OPTIONS.items()))
def test_option_surface(path, options):
    result = CliRunner().invoke(cli, [*path, "--help"])
    assert result.exit_code == 0, result.output
    for opt in options:
        assert opt in result.output, f"{' '.join(path)}: missing option {opt}"
