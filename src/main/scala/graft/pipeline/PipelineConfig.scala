package graft.pipeline

/** Typed pipeline configuration (reference A1: config.json load +
  * fail-fast validation, /root/reference/Unity_to_BigQuery.py:24-29,
  * 194-195). Tenants map project ids to warehouse datasets — the typed
  * form of the reference's hard-coded if/elif routing chain
  * (Unity_to_BigQuery.py:143-150, 202-210).
  */
final case class TenantConfig(appId: String, dataset: String) {
  require(appId.nonEmpty, "tenant appId must be non-empty")
  require(dataset.nonEmpty, "tenant dataset must be non-empty")
}

final case class PipelineConfig(
    exportRoot: String,
    warehouseRoot: String,
    checkpointPath: String,
    tenants: Seq[TenantConfig],
    reportTypes: Seq[String]) {
  require(exportRoot.nonEmpty, "exportRoot is required")
  require(warehouseRoot.nonEmpty, "warehouseRoot is required")
  require(checkpointPath.nonEmpty, "checkpointPath is required")
  require(tenants.nonEmpty, "at least one tenant is required")
  require(reportTypes.nonEmpty, "at least one report type is required")
  require(tenants.map(_.appId).distinct.size == tenants.size,
    "tenant appIds must be unique")

  def datasetFor(appId: String): Option[String] =
    tenants.find(_.appId == appId).map(_.dataset)
}
