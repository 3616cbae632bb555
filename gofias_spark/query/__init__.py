"""gofias_spark subpackage."""
