package lakeshine;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.connector.catalog.DelegatingCatalogExtension;

/**
 * A Spark catalog plugin that makes a second catalog NAME resolve to
 * the session catalog, giving three-part identifiers such as
 * {@code iceberg.demo.events} (the reference stack's namespace,
 * /root/reference/compose/seed.sh:65) first-class resolution instead
 * of a textual rewrite. Register with:
 *
 *   spark.sql.catalog.iceberg=lakeshine.SessionAliasCatalog
 *
 * DelegatingCatalogExtension forwards every TableCatalog /
 * SupportsNamespaces call to the delegate; Spark only auto-wires the
 * delegate for spark_catalog overrides, so the constructor wires it
 * explicitly to the active session's V2SessionCatalog. Catalog
 * plugins load lazily at first reference during analysis, when an
 * active session is guaranteed.
 */
public class SessionAliasCatalog extends DelegatingCatalogExtension {

  public SessionAliasCatalog() {
    setDelegateCatalog(
        SparkSession.active().sessionState().catalogManager().v2SessionCatalog());
  }
}
