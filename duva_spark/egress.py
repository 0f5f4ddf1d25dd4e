"""Egress: S3 artifact layout + presigned URLs, optional Tableau/Hyper
publication (K1–K5 in SURVEY §2a).

Reference behavior reproduced:
- S3 key layout ``{server_id}/{username}/{form_id}_{filename}`` with
  upload/download/delete (app/libs/s3/client.py:15-47, layout
  app/crud/crud_hyperfile.py:84-85);
- presigned GET URLs with 3600 s expiry (app/libs/s3/client.py:49-64,
  app/core/config.py:27);
- Tableau publish: PAT sign-in, project lookup, datasources.publish with
  mode=Overwrite (app/libs/tableau/client.py:40-74);
- `.hyper` artifact per dataset (app/core/importer.py:242-246).

boto3/tableauserverclient/tableauhyperapi are not in this container, so
each client is gated behind an import-try: the layout/protocol logic is
real and unit-testable, the network call raises a clear error if the
dependency is absent.
"""

from __future__ import annotations

import time

DOWNLOAD_EXPIRE_SECONDS = 3600  # app/core/config.py:27


def artifact_key(server_id: str | int, username: str, form_id: str | int, filename: str) -> str:
    """S3 object key for a dataset artifact (crud_hyperfile.py:84-85)."""
    return f"{server_id}/{username}/{form_id}_{filename}"


def presigned_url_expiry(now: float | None = None, expires_in: int = DOWNLOAD_EXPIRE_SECONDS) -> float:
    return (now if now is not None else time.time()) + expires_in


class S3ArtifactClient:
    """Upload/download/delete dataset artifacts + presigned GETs."""

    def __init__(self, bucket: str, client=None):
        if client is None:
            try:
                import boto3  # noqa: PLC0415

                client = boto3.client("s3")
            except ImportError as exc:
                raise ImportError(
                    "boto3 not installed — pass an injected client or install boto3"
                ) from exc
        self.bucket = bucket
        self.client = client

    def upload(self, local_path: str, key: str) -> None:
        self.client.upload_file(local_path, self.bucket, key)

    def download(self, key: str, local_path: str) -> None:
        self.client.download_file(self.bucket, key, local_path)

    def delete(self, key: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=key)

    def presigned_download_url(self, key: str, expires_in: int = DOWNLOAD_EXPIRE_SECONDS) -> str:
        return self.client.generate_presigned_url(
            "get_object",
            Params={"Bucket": self.bucket, "Key": key},
            ExpiresIn=expires_in,
        )


def publish_to_tableau(
    hyper_path: str,
    server_address: str,
    site_name: str,
    token_name: str,
    token_value: str,
    project_name: str,
) -> None:
    """Publish a .hyper extract with mode=Overwrite
    (app/libs/tableau/client.py:40-74). Requires tableauserverclient."""
    try:
        import tableauserverclient as TSC  # noqa: PLC0415
    except ImportError as exc:
        raise ImportError("tableauserverclient not installed — Tableau egress unavailable") from exc

    auth = TSC.PersonalAccessTokenAuth(token_name, token_value, site_id=site_name)
    server = TSC.Server(server_address, use_server_version=True)
    with server.auth.sign_in(auth):
        project = next(
            (p for p in TSC.Pager(server.projects) if p.name == project_name), None
        )
        if project is None:
            raise ValueError(f"Tableau project not found: {project_name}")
        item = TSC.DatasourceItem(project.id)
        server.datasources.publish(item, hyper_path, TSC.Server.PublishMode.Overwrite)


def export_hyper(df, hyper_path: str, table_name: str = "Extract") -> int:
    """Optional byte-compatible `.hyper` artifact (K1): the reference's
    primary sink (schema "Extract"."Extract", CREATE_AND_REPLACE,
    app/core/importer.py:242-256). The Parquet dataset is our primary
    sink; this egress reproduces the artifact for Tableau consumers.

    Returns the row count (the COPY contract). Requires tableauhyperapi;
    the data is brought to the writer via toPandas (the Hyper API is a
    single-process embedded engine — there is no distributed write path,
    matching the reference's own constraint).
    """
    try:
        from tableauhyperapi import (  # noqa: PLC0415
            Connection,
            CreateMode,
            HyperProcess,
            SqlType,
            TableDefinition,
            TableName,
            Telemetry,
        )
    except ImportError as exc:
        raise ImportError("tableauhyperapi not installed — .hyper egress unavailable") from exc

    from pyspark.sql import types as T  # noqa: PLC0415

    # duva's 3-type universe (app/core/importer.py:38-51), widened like
    # our CSV source
    def sql_type(dt):
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return SqlType.big_int()
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return SqlType.double()
        if isinstance(dt, T.BooleanType):
            return SqlType.bool()
        if isinstance(dt, T.DateType):
            return SqlType.date()
        if isinstance(dt, T.TimestampType):
            return SqlType.timestamp()
        return SqlType.text()

    table = TableName("Extract", table_name)
    definition = TableDefinition(
        table, [TableDefinition.Column(f.name, sql_type(f.dataType)) for f in df.schema.fields]
    )
    pdf = df.toPandas()
    with HyperProcess(telemetry=Telemetry.DO_NOT_SEND_USAGE_DATA_TO_TABLEAU) as hyper:
        with Connection(
            hyper.endpoint, database=hyper_path, create_mode=CreateMode.CREATE_AND_REPLACE
        ) as conn:
            conn.catalog.create_schema("Extract")
            conn.catalog.create_table(definition)
            from tableauhyperapi import Inserter  # noqa: PLC0415

            with Inserter(conn, definition) as inserter:
                inserter.add_rows(pdf.itertuples(index=False, name=None))
                inserter.execute()
    return len(pdf)
