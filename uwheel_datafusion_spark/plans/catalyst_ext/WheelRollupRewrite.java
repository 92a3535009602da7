// Catalyst-visible wheel rewrite (round 13 — SURVEY §7.6 / VERDICT r12
// next #10): a REAL optimizer rule, injected JVM-side, that rewrites
//
//     Aggregate [SUM(value)] <- Project* <- Filter(ts >= L1 AND ts < L2)
//         <- Project* <- LeafRelation(fact)
//
// onto the MATERIALIZED minute-rollup view whenever both literals are
// slot-aligned — so UNMODIFIED SQL tools (JDBC, notebooks, anything
// that plans through this session) hit the wheel without the library
// router's regex front end. The library router (plans/sql_router.py)
// remains the general fallback: it covers the grouped/keyed/sketch
// rewrites; this rule is the flagship scalar-SUM path, end to end in
// the optimizer where DataFusion's uwheel integration lives
// (reference src/main.rs:205-235 serves from the wheel instead of the
// scan; datafusion-uwheel's design doc injects exactly this kind of
// logical-plan rewrite).
//
// Mechanics (no Catalyst expression construction beyond reuse):
// registration receives the fact table's ts/value ExprIds plus a
// Project(alias(ts), alias(value), rollup-parquet-relation) plan built
// DataFrame-side; the aliases are REBOUND to the fact's ExprIds
// (Alias.withExprId), so the rewrite is a pure child swap — every
// upstream reference resolves unchanged, and Catalyst keeps planning
// (partition pruning on the rollup's dt dirs, codegen) as if the user
// had queried the rollup directly. Conservative bail-outs everywhere:
// any grouping, any non-SUM aggregate, DISTINCT/FILTER clauses,
// unaligned literals, or a reference outside {ts, value} leaves the
// plan untouched (the fact scan stays — correctness first).
//
// The rule is registered through ExperimentalMethods.extraOptimizations
// (the runtime twin of a spark.sql.extensions injectOptimizerRule —
// same Rule[LogicalPlan] class, injectable either way; the tests use
// the runtime hook because the session already exists).

import java.util.ArrayList;
import java.util.List;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.IsNotNull;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression;
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum;
import org.apache.spark.sql.catalyst.plans.logical.Aggregate;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.rules.Rule;

public class WheelRollupRewrite extends Rule<LogicalPlan> {

    public static final class Target {
        final long tsId;
        final long valueId;
        final long granUs;
        final scala.collection.immutable.Seq<NamedExpression> aliases;
        final LogicalPlan rollupChild;
        final AttributeReference bucketAttr; // bucket_ms, for pushdown
        final AttributeReference dtAttr;     // dt partition col, or null

        Target(long tsId, long valueId, long granUs,
               scala.collection.immutable.Seq<NamedExpression> aliases,
               LogicalPlan rollupChild,
               AttributeReference bucketAttr,
               AttributeReference dtAttr) {
            this.tsId = tsId;
            this.valueId = valueId;
            this.granUs = granUs;
            this.aliases = aliases;
            this.rollupChild = rollupChild;
            this.bucketAttr = bucketAttr;
            this.dtAttr = dtAttr;
        }
    }

    private static final ConcurrentHashMap<Long, Target> TARGETS =
        new ConcurrentHashMap<>();

    /** rollupProject must be Project([alias(ts), alias(value)], rel);
     *  the two aliases are rebound to the fact's ExprIds so the swap
     *  preserves every upstream reference. */
    public static void register(
            long tsId, long valueId, long granMs, LogicalPlan rollupProject) {
        Project p = (Project) rollupProject;
        List<NamedExpression> out = new ArrayList<>();
        scala.collection.Iterator<NamedExpression> it =
            p.projectList().iterator();
        int i = 0;
        while (it.hasNext()) {
            Alias a = (Alias) it.next();
            long id = (i == 0) ? tsId : valueId;
            out.add(a.withExprId(
                org.apache.spark.sql.catalyst.expressions.ExprId$
                    .MODULE$.apply(id)));
            i++;
        }
        // locate the rollup's own bucket_ms (pushdown) and dt
        // (partition pruning) attributes — the per-query pruning
        // predicates the splice injects BELOW the alias projection,
        // which the reapplied ts-condition (a cast over bucket_ms)
        // cannot give Catalyst by itself
        AttributeReference bucket = null;
        AttributeReference dt = null;
        scala.collection.Iterator<?> oit = p.child().output().iterator();
        while (oit.hasNext()) {
            AttributeReference a = (AttributeReference) oit.next();
            if ("bucket_ms".equals(a.name())) {
                bucket = a;
            } else if ("dt".equals(a.name())) {
                dt = a;
            }
        }
        TARGETS.put(tsId, new Target(
            tsId, valueId, granMs * 1000L, toSeq(out), p.child(),
            bucket, dt));
    }

    public static void clear() {
        TARGETS.clear();
    }

    public static int registeredCount() {
        return TARGETS.size();
    }

    private static <T> scala.collection.immutable.Seq<T> toSeq(List<T> xs) {
        return scala.jdk.javaapi.CollectionConverters.asScala(xs).toSeq();
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        if (TARGETS.isEmpty()) {
            return plan;
        }
        return rewrite(plan);
    }

    private LogicalPlan rewrite(LogicalPlan node) {
        List<LogicalPlan> kids = new ArrayList<>();
        boolean changed = false;
        scala.collection.Iterator<LogicalPlan> it = node.children().iterator();
        while (it.hasNext()) {
            LogicalPlan c = it.next();
            LogicalPlan r = rewrite(c);
            kids.add(r);
            if (r != c) {
                changed = true;
            }
        }
        LogicalPlan cur = changed
            ? (LogicalPlan) node.withNewChildren(toSeq(kids))
            : node;
        if (cur instanceof Aggregate) {
            LogicalPlan swapped = tryRewrite((Aggregate) cur);
            if (swapped != null) {
                return swapped;
            }
        }
        return cur;
    }

    private static void splitConjuncts(Expression e, List<Expression> out) {
        if (e instanceof And) {
            splitConjuncts(((And) e).left(), out);
            splitConjuncts(((And) e).right(), out);
        } else {
            out.add(e);
        }
    }

    private static Long attrId(Expression e) {
        if (e instanceof AttributeReference) {
            return ((AttributeReference) e).exprId().id();
        }
        return null;
    }

    private static Long litMicros(Expression e) {
        if (e instanceof Literal) {
            Object v = ((Literal) e).value();
            if (v instanceof Long) {
                return (Long) v;
            }
        }
        return null;
    }

    private boolean refsWithin(LogicalPlan p, Target t) {
        scala.collection.Iterator<?> it = p.references().iterator();
        while (it.hasNext()) {
            Object a = it.next();
            long id = ((org.apache.spark.sql.catalyst.expressions.Attribute) a)
                .exprId().id();
            if (id != t.tsId && id != t.valueId) {
                return false;
            }
        }
        return true;
    }

    private LogicalPlan tryRewrite(Aggregate agg) {
        if (!agg.groupingExpressions().isEmpty()) {
            return null;
        }
        // walk: Aggregate -> upper Projects -> Filter -> lower chain -> leaf
        List<Project> upper = new ArrayList<>();
        LogicalPlan cur = agg.child();
        while (cur instanceof Project) {
            upper.add((Project) cur);
            cur = ((Project) cur).child();
        }
        if (!(cur instanceof Filter)) {
            return null;
        }
        Filter f = (Filter) cur;
        LogicalPlan below = f.child();
        while (below instanceof Project) {
            below = ((Project) below).child();
        }
        if (!below.children().isEmpty()) {
            return null; // must bottom out at a leaf relation
        }
        // condition: conjuncts over exactly one registered ts attr —
        // one >=, one <, optional IsNotNull(ts); literals slot-aligned
        List<Expression> conj = new ArrayList<>();
        splitConjuncts(f.condition(), conj);
        Long tsId = null;
        Long lo = null;
        Long hi = null;
        for (Expression e : conj) {
            if (e instanceof IsNotNull) {
                Long id = attrId(((IsNotNull) e).child());
                if (id == null) {
                    return null;
                }
                if (tsId == null) {
                    tsId = id;
                } else if (!tsId.equals(id)) {
                    return null;
                }
            } else if (e instanceof GreaterThanOrEqual) {
                Long id = attrId(((GreaterThanOrEqual) e).left());
                Long v = litMicros(((GreaterThanOrEqual) e).right());
                if (id == null || v == null || lo != null) {
                    return null;
                }
                if (tsId == null) {
                    tsId = id;
                } else if (!tsId.equals(id)) {
                    return null;
                }
                lo = v;
            } else if (e instanceof LessThan) {
                Long id = attrId(((LessThan) e).left());
                Long v = litMicros(((LessThan) e).right());
                if (id == null || v == null || hi != null) {
                    return null;
                }
                if (tsId == null) {
                    tsId = id;
                } else if (!tsId.equals(id)) {
                    return null;
                }
                hi = v;
            } else {
                return null;
            }
        }
        if (tsId == null || lo == null || hi == null) {
            return null;
        }
        Target t = TARGETS.get(tsId);
        if (t == null) {
            return null;
        }
        if (lo % t.granUs != 0 || hi % t.granUs != 0) {
            return null; // unaligned endpoints: the scan stays correct
        }
        // aggregates: every output must be a plain SUM(value)
        scala.collection.Iterator<NamedExpression> ait =
            agg.aggregateExpressions().iterator();
        while (ait.hasNext()) {
            Expression e = (Expression) ait.next();
            if (e instanceof Alias) {
                e = ((Alias) e).child();
            }
            if (!(e instanceof AggregateExpression)) {
                return null;
            }
            AggregateExpression ae = (AggregateExpression) e;
            if (ae.isDistinct() || ae.filter().isDefined()) {
                return null;
            }
            if (!(ae.aggregateFunction() instanceof Sum)) {
                return null;
            }
            Long id = attrId(((Sum) ae.aggregateFunction()).child());
            if (id == null || id != t.valueId) {
                return null;
            }
        }
        // every reference between Aggregate and the leaf must be ts/value
        for (Project p : upper) {
            if (!refsWithin(p, t)) {
                return null;
            }
        }
        if (!refsWithin(f, t)) {
            return null;
        }
        // splice: the per-query PRUNING filter sits below the alias
        // projection so it lands on the rollup scan directly —
        // bucket_ms range pushes to parquet row groups, the dt bounds
        // prune day partitions (the 100 TB read path); the original
        // ts-condition is reapplied above for semantic identity
        LogicalPlan inner = t.rollupChild;
        Expression prune = null;
        if (t.bucketAttr != null) {
            Literal bLo = org.apache.spark.sql.catalyst.expressions
                .Literal$.MODULE$.apply(Long.valueOf(lo / 1000L));
            Literal bHi = org.apache.spark.sql.catalyst.expressions
                .Literal$.MODULE$.apply(Long.valueOf(hi / 1000L));
            prune = new And(
                new GreaterThanOrEqual(t.bucketAttr, bLo),
                new LessThan(t.bucketAttr, bHi));
        }
        if (t.dtAttr != null) {
            // the saved layout's dt partition values infer as DATE by
            // default (partitionColumnTypeInference); a type-matched
            // literal keeps the injected plan RESOLVED either way
            long dayLo = Math.floorDiv(lo / 1000L, 86_400_000L);
            long dayHi = Math.floorDiv((hi - 1) / 1000L, 86_400_000L);
            Literal lLo;
            Literal lHi;
            if (t.dtAttr.dataType()
                    instanceof org.apache.spark.sql.types.DateType) {
                // Literal.apply(LocalDate) maps to a DateType literal
                lLo = org.apache.spark.sql.catalyst.expressions.Literal$
                    .MODULE$.apply(java.time.LocalDate.ofEpochDay(dayLo));
                lHi = org.apache.spark.sql.catalyst.expressions.Literal$
                    .MODULE$.apply(java.time.LocalDate.ofEpochDay(dayHi));
            } else {
                java.time.format.DateTimeFormatter fmt =
                    java.time.format.DateTimeFormatter.ISO_LOCAL_DATE;
                lLo = org.apache.spark.sql.catalyst.expressions.Literal$
                    .MODULE$.apply(java.time.LocalDate.ofEpochDay(dayLo)
                        .format(fmt));
                lHi = org.apache.spark.sql.catalyst.expressions.Literal$
                    .MODULE$.apply(java.time.LocalDate.ofEpochDay(dayHi)
                        .format(fmt));
            }
            Expression dtCond = new And(
                new GreaterThanOrEqual(t.dtAttr, lLo),
                new org.apache.spark.sql.catalyst.expressions
                    .LessThanOrEqual(t.dtAttr, lHi));
            prune = (prune == null) ? dtCond : new And(prune, dtCond);
        }
        if (prune != null) {
            inner = new Filter(prune, inner);
        }
        LogicalPlan replacement = new Project(t.aliases, inner);
        LogicalPlan out = new Filter(f.condition(), replacement);
        for (int i = upper.size() - 1; i >= 0; i--) {
            out = new Project(upper.get(i).projectList(), out);
        }
        List<LogicalPlan> one = new ArrayList<>();
        one.add(out);
        return (LogicalPlan) agg.withNewChildren(toSeq(one));
    }
}
