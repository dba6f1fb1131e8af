package minicat;

import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Group-based row-level operation, group-SCOPED since r4 (VERDICT r3 #2):
 * declaring {@code _group} as a required metadata attribute makes Spark
 * carry the group id through the ReplaceData plan and enables the runtime
 * group-filtering rule; the scan instance is shared with the write builder
 * so the commit replaces exactly the groups the (runtime-filtered) scan
 * read — Iceberg-faithful copy-on-write, instead of the r3 behavior where
 * every MERGE rewrote the whole table. Maps the reference's
 * rerun-overwrites behavior (SURVEY.md §2.3 J4).
 */
public class MiniRowLevelOperation implements RowLevelOperation {
  private final String key;
  private final StructType tableSchema;
  private final Command cmd;
  private MiniRowLevelScan scan;

  MiniRowLevelOperation(String key, StructType tableSchema, Command cmd) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.cmd = cmd;
  }

  @Override
  public Command command() {
    return cmd;
  }

  @Override
  public NamedReference[] requiredMetadataAttributes() {
    return new NamedReference[] {Expressions.column(MiniTable.GROUP_COL)};
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    // One operation = one scan: the write commits against the retained-group
    // set of THE scan Spark planned it with. If Spark ever re-plans and asks
    // for a second scan, silently letting the newest scan govern an earlier
    // write's commit would corrupt the copy-on-write group set — fail fast
    // instead (ADVICE r4).
    if (scan != null) {
      throw new IllegalStateException(
          "MiniRowLevelOperation: newScanBuilder called twice for one row-level"
              + " operation; the write's retained-group binding would be ambiguous");
    }
    scan = new MiniRowLevelScan(key, tableSchema);
    return scan;
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    // Bind the scan explicitly at write-build time: a row-level write with
    // no planned scan has no retained-group set to commit against.
    final MiniRowLevelScan s = scan;
    if (s == null) {
      throw new IllegalStateException(
          "MiniRowLevelOperation: newWriteBuilder before newScanBuilder — "
              + "row-level commit needs the planned scan's retained groups");
    }
    return new MiniWriteBuilder(key, tableSchema, info.schema(), true, s::retainedGroups);
  }
}
