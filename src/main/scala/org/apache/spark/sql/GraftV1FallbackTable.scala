package org.apache.spark.sql

/** Bridge to the `private[sql]` V1-fallback table trait — the
  * supported pattern for connectors whose streaming source/sink are
  * V1 implementations (Delta's `DeltaTableV2` sits under
  * `org.apache.spark.sql.delta` for exactly this access): a V2
  * `Table` additionally implementing this trait lets
  * `writeStream.toTable(t)` and `readStream.table(t)` fall back to
  * the provider's own `StreamSinkProvider` / `StreamSourceProvider`
  * via the synthesized [[v1Table]] metadata. */
trait GraftV1FallbackTable
    extends connector.catalog.V2TableWithV1Fallback
