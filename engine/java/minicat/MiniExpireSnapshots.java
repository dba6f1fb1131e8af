package minicat;

import java.util.Iterator;
import java.util.List;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.procedures.BoundProcedure;
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter;
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure;
import org.apache.spark.sql.connector.read.LocalScan;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

/**
 * Iceberg-style table maintenance as a REAL DSv2 procedure (r4):
 * {@code CALL mini.expire_snapshots(table => 'ns.t', retain_last => N)}
 * drops all but the newest N snapshot pointer vectors, returning one row
 * (expired_count, current_snapshot). Reads pinned to an expired snapshot
 * fail at analysis, exactly like Iceberg after expire_snapshots; group
 * lists shared with retained snapshots stay alive (pointer vectors share
 * structure, so expiry frees only lists no retained snapshot references).
 */
public final class MiniExpireSnapshots implements UnboundProcedure, BoundProcedure {
  private static final StructType OUT =
      new StructType()
          .add("expired_count", DataTypes.LongType, false)
          .add("current_snapshot", DataTypes.LongType, false);

  private final String catalogName;

  MiniExpireSnapshots(String catalogName) {
    this.catalogName = catalogName;
  }

  @Override
  public String name() {
    return "expire_snapshots";
  }

  @Override
  public String description() {
    return "drop all but the newest retain_last snapshots of a MiniCatalog table";
  }

  @Override
  public BoundProcedure bind(StructType inputType) {
    return this;
  }

  @Override
  public ProcedureParameter[] parameters() {
    return new ProcedureParameter[] {
      ProcedureParameter.in("table", DataTypes.StringType).build(),
      ProcedureParameter.in("retain_last", DataTypes.IntegerType).build(),
    };
  }

  @Override
  public boolean isDeterministic() {
    return false;
  }

  @Override
  public Iterator<Scan> call(InternalRow input) {
    String table = input.getUTF8String(0).toString();
    int retain = input.getInt(1);
    if (retain < 1) {
      throw new IllegalArgumentException("retain_last must be >= 1");
    }
    String key = catalogName + "." + table;
    long expired = MiniStore.expireSnapshots(key, retain);
    long current = MiniStore.currentSnapshot(key);
    InternalRow row = new GenericInternalRow(new Object[] {expired, current});
    Scan result =
        new LocalScan() {
          @Override
          public InternalRow[] rows() {
            return new InternalRow[] {row};
          }

          @Override
          public StructType readSchema() {
            return OUT;
          }
        };
    return List.of(result).iterator();
  }
}
