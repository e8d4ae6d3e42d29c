"""Engine errors. The reference hard-exits with a message on a missing
column (e.g. /root/reference/src/operations/chainables/select.rs:53-58);
we raise typed exceptions instead so the fluent API is library-friendly."""


class QsvError(Exception):
    """Base error for qsvspark."""


class ColumnNotFoundError(QsvError):
    def __init__(self, column: str, available: list[str]):
        super().__init__(
            f"Column '{column}' not found. Available columns: {', '.join(available)}"
        )
        self.column = column
        self.available = available


class InvalidArgumentError(QsvError):
    """Bad operator argument (unknown agg function, bad interval, ...)."""


class LoadError(QsvError):
    """Bad load request (missing file, mixed CSV+Parquet, ...)."""
