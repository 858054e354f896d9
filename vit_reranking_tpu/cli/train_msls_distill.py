"""Teacher->student distillation driver (reference train_msls_distill.py):
same loop as train_msls_baseline with --distill set; kept as a separate entry
point for script parity."""

from .train_msls_baseline import main as _main


def main(argv=None):
    argv = list(argv) if argv is not None else None
    return _main(argv)


if __name__ == "__main__":
    main()
