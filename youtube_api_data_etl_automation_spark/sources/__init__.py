"""Sources: Parquet table loaders (driver testdata) and the API-shaped
custom DataSource with a stubbed transport."""
