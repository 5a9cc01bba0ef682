"""CLI entry point tests (the reference's L3 surface,
examples/nqueens/src/main.rs and examples/employee-scheduling/src/main.rs)."""

from constraint_solver_tpu.cli import nqueens as nqueens_cli
from constraint_solver_tpu.cli import scheduling as scheduling_cli
from constraint_solver_tpu.utils.printing import format_board


def test_nqueens_cli_solves(capsys):
    score = nqueens_cli.main(
        ["--seed", "42", "--board-size", "8", "--platform", "cpu"]
    )
    out = capsys.readouterr().out
    assert score == 0
    assert "result.score: 0" in out
    assert out.count("Q") == 8  # the board printer drew all 8 queens


def test_scheduling_cli_runs(capsys):
    hard = scheduling_cli.main(
        [
            "--platform", "cpu", "--rounds", "60", "--days", "14",
            "--employees", "4", "--quiet",
        ]
    )
    out = capsys.readouterr().out
    assert "result.score:" in out
    assert hard >= 0


def test_format_board_matches_reference_layout():
    """4x4 grid shape per the reference Debug printer (nqueens lib.rs:26-60)."""
    board = format_board([1, 3, 0, 2])
    lines = board.split("\n")
    assert len(lines) == 9  # 2n+1 rows
    assert lines[0] == "-" * 17  # 4n+1 dashes
    assert lines[1] == "|   |   | Q |   |"  # row 0 has the queen of column 2
    assert lines[3] == "| Q |   |   |   |"  # row 1 -> column 0


def test_nqueens_cli_checkpoint_resume(tmp_path, capsys):
    from constraint_solver_tpu.cli import nqueens as cli

    from constraint_solver_tpu.utils.checkpoint import checkpoint_path

    ckpt = str(tmp_path / "nq.ckpt")
    cli.main(["--platform", "cpu", "--board-size", "10", "--rounds", "4",
              "--checkpoint", ckpt, "--checkpoint-every", "2", "--quiet"])
    capsys.readouterr()
    import os
    assert os.path.exists(checkpoint_path(ckpt))
    cli.main(["--platform", "cpu", "--board-size", "10", "--rounds", "8",
              "--checkpoint", ckpt, "--quiet"])
    out = capsys.readouterr().out
    assert "resumed from" in out


def test_population_cli_checkpoint_resume(tmp_path, capsys):
    from constraint_solver_tpu.cli import scheduling as cli

    ckpt = str(tmp_path / "sched.ckpt")
    cli.main(["--platform", "cpu", "--employees", "3", "--days", "14",
              "--rounds", "4", "--population", "4",
              "--checkpoint", ckpt, "--checkpoint-every", "2", "--quiet"])
    capsys.readouterr()
    from constraint_solver_tpu.utils.checkpoint import checkpoint_exists
    assert checkpoint_exists(ckpt)
    cli.main(["--platform", "cpu", "--employees", "3", "--days", "14",
              "--rounds", "8", "--population", "4",
              "--checkpoint", ckpt, "--quiet"])
    out = capsys.readouterr().out
    assert "resumed from" in out


def test_ackley_cli_converges(capsys):
    from constraint_solver_tpu.cli import ackley as cli

    rc = cli.main(["--platform", "cpu", "--dims", "2", "--rounds", "200"])
    out = capsys.readouterr().out
    assert rc == 0 and "result.value" in out
