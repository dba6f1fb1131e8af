package minicat;

import java.util.HashSet;
import java.util.Set;

import org.apache.spark.sql.connector.expressions.Expression;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.Literal;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.filter.Predicate;
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering;
import org.apache.spark.sql.types.StructType;

/**
 * The row-level-operation scan: declares {@code _group} as its runtime
 * filter attribute, so Spark's RowLevelOperationRuntimeGroupFiltering rule
 * plans a dynamic-pruning subquery (matched rows -> distinct groups) and
 * calls {@link #filter} with {@code _group IN (...)} before partitions are
 * planned — exactly the mechanism Iceberg uses with {@code _file}. The
 * retained-group set is then what the commit replaces (group-scoped
 * copy-on-write, see MiniStore.replaceGroups).
 */
public class MiniRowLevelScan extends MiniScan implements SupportsRuntimeV2Filtering {
  private int[] retained; // null until a parsable runtime filter arrives

  MiniRowLevelScan(String key, StructType tableSchema) {
    super(key, tableSchema, null);
  }

  /** Never stats-skip a row-level scan: the group-scoped commit replaces
   *  every retained group with this scan's output, so a group skipped here
   *  but retained by the runtime filter would lose its rows. */
  @Override
  protected boolean statsSkipAllowed() {
    return false;
  }

  /** null = never filtered (treat as all groups). */
  int[] retainedGroups() {
    return retained;
  }

  @Override
  protected boolean groupRetained(int g) {
    if (retained == null) {
      return true;
    }
    for (int r : retained) {
      if (r == g) {
        return true;
      }
    }
    return false;
  }

  @Override
  public NamedReference[] filterAttributes() {
    return new NamedReference[] {Expressions.column(MiniTable.GROUP_COL)};
  }

  @Override
  public void filter(Predicate[] predicates) {
    for (Predicate p : predicates) {
      Set<Integer> keep = parseGroupIn(p);
      if (keep != null) {
        int[] r = new int[keep.size()];
        int i = 0;
        for (int g : keep) {
          r[i++] = g;
        }
        retained = r;
        return;
      }
    }
    // unparsable filter: keep all groups (correct, just not pruned)
  }

  /** Parse {@code _group IN (v...)} / {@code _group = v}; null if not ours. */
  private static Set<Integer> parseGroupIn(Predicate p) {
    String name = p.name();
    if (!"IN".equalsIgnoreCase(name) && !"=".equals(name)) {
      return null;
    }
    Expression[] ch = p.children();
    if (ch.length < 2 || !(ch[0] instanceof NamedReference)) {
      return null;
    }
    String[] parts = ((NamedReference) ch[0]).fieldNames();
    if (parts.length != 1 || !parts[0].equals(MiniTable.GROUP_COL)) {
      return null;
    }
    Set<Integer> keep = new HashSet<>();
    for (int i = 1; i < ch.length; i++) {
      if (!(ch[i] instanceof Literal)) {
        return null;
      }
      Object v = ((Literal<?>) ch[i]).value();
      if (!(v instanceof Number)) {
        return null;
      }
      keep.add(((Number) v).intValue());
    }
    return keep;
  }
}
