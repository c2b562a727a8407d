package graft

/** DuckDB oracle formulations for the Northwind end-to-end queries
  * (q36/q39/q40/q41). The Spark side runs the OPERATIONAL pipeline — two
  * genuine incremental cycles with audit state, upserts, and the repair
  * post-hook; the oracle computes the DECLARATIVE batch equivalent over the
  * full change history (the same merge ≡ fromHistory equivalence the q11
  * oracle gates). Every fixture derivation in NorthwindSources is mirrored
  * here expression-for-expression.
  */
object NorthwindOracle {

  private val T1 = "TIMESTAMP '2024-01-01 00:00:00'"
  private val T2 = "TIMESTAMP '2024-02-01 00:00:00'"

  /** md5(concat_ws('-', coalesce(x::varchar,'') ...)) — SqlFunctions.rowHash. */
  private def hash(cols: String*): String =
    "md5(concat_ws('-', " + cols.map(c => s"coalesce(($c)::varchar, '')").mkString(", ") + "))"

  /** temporalSk: key cols + epoch micros of the effective timestamp. */
  private def sk(keys: Seq[String], eff: String): String =
    hash(keys :+ s"epoch_us($eff)": _*)

  private val DummySk = "md5(concat_ws('-', '0', '-2208988800000000'))"

  // -------------------------------------------------- source histories

  /** customers: base projection with a parameterizable contact_title. */
  private def custCols(title: String) = s"""
      (c_custkey + 1)::varchar AS customerid,
      c_name AS companyname,
      'Contact ' || c_custkey AS contactname,
      $title AS contacttitle,
      'Addr ' || (c_custkey % 1000) AS address,
      'City ' || c_nationkey AS city,
      (c_nationkey % 5)::varchar AS region,
      (10000 + c_custkey % 90000)::varchar AS postalcode,
      'Country ' || c_nationkey AS country,
      '555-' || (c_custkey % 10000) AS phone,
      CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE '556-' || (c_custkey % 10000) END AS fax"""

  private val custHist = s"""
  cust_hist AS (
    SELECT ${custCols("c_mktsegment")}, $T1 AS src_ts, 'I' AS src_op
    FROM customer WHERE c_custkey % 7 <> 2
    UNION ALL
    SELECT ${custCols("c_mktsegment")}, $T2, 'I'
    FROM customer WHERE c_custkey % 7 = 2
    UNION ALL
    SELECT ${custCols("'UPDATED'")}, $T2, 'I'
    FROM customer WHERE c_custkey % 7 <> 2 AND c_custkey % 10 = 3
    UNION ALL
    SELECT ${custCols("c_mktsegment")}, $T2, 'D'
    FROM customer WHERE c_custkey % 7 <> 2 AND c_custkey % 10 <> 3 AND c_custkey % 50 = 0
  )"""

  private def orderCols(shipped: String) = s"""
      o_orderkey + 1 AS orderid,
      (o_custkey + 1)::varchar AS customerid,
      (o_orderkey % 10 + 1)::int AS employeeid,
      (o_orderkey % 3 + 1)::int AS shipvia,
      o_orderdate::date AS orderdate,
      o_orderdate::date + 14 AS requireddate,
      $shipped AS shippeddate,
      (o_orderkey % 97)::double AS freight,
      'Ship ' || (o_orderkey % 50) AS shipname,
      'SAddr ' || (o_orderkey % 1000) AS shipaddress,
      'SCity ' || (o_custkey % 100) AS shipcity,
      (o_orderkey % 5)::varchar AS shipregion,
      (30000 + o_orderkey % 60000)::varchar AS shippostalcode,
      'SCountry ' || (o_orderkey % 25) AS shipcountry"""

  private val shippedBase =
    "CASE WHEN o_orderstatus = 'F' THEN o_orderdate::date + 7 ELSE NULL END"

  private val ordHist = s"""
  ord_hist AS (
    SELECT ${orderCols(shippedBase)}, $T1 AS src_ts, 'I' AS src_op
    FROM orders WHERE o_orderkey % 13 <> 5
    UNION ALL
    SELECT ${orderCols(shippedBase)}, $T2, 'I'
    FROM orders WHERE o_orderkey % 13 = 5
    UNION ALL
    SELECT ${orderCols("o_orderdate::date + 10")}, $T2, 'I'
    FROM orders WHERE o_orderkey % 13 <> 5 AND o_orderkey % 11 = 4
    UNION ALL
    SELECT ${orderCols(shippedBase)}, $T2, 'D'
    FROM orders WHERE o_orderkey % 13 <> 5 AND o_orderkey % 11 <> 4 AND o_orderkey % 101 = 7
  )"""

  private def detailCols(qty: String) = s"""
      l_orderkey + 1 AS orderid,
      l_partkey + 1 AS productid,
      (l_partkey % 500)::double AS unitprice,
      $qty AS quantity,
      (l_linenumber::double / 10) AS discount"""

  private val detHist = s"""
  li AS (
    SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_partkey
      ORDER BY l_linenumber, l_quantity) AS __rn FROM lineitem) WHERE __rn = 1),
  det_hist AS (
    SELECT ${detailCols("l_quantity::int")}, $T1 AS src_ts, 'I' AS src_op
    FROM li WHERE l_orderkey % 13 <> 5
    UNION ALL
    SELECT ${detailCols("l_quantity::int")}, $T2, 'I'
    FROM li WHERE l_orderkey % 13 = 5
    UNION ALL
    SELECT ${detailCols("l_quantity::int + 1")}, $T2, 'I'
    FROM li WHERE l_orderkey % 13 <> 5 AND l_orderkey % 9 = 2
  )"""

  private def prodCols(name: String) = s"""
      p_partkey + 1 AS productid,
      $name AS productname,
      p_partkey % 100 + 1 AS supplierid,
      p_partkey % 10 + 1 AS categoryid,
      p_size || ' per box' AS quantityperunit,
      (p_partkey % 200)::double AS unitprice,
      p_size AS unitsinstock,
      (p_partkey % 7)::int AS unitsonorder,
      (p_partkey % 5)::int AS reorderlevel,
      (p_partkey % 20 = 0) AS discontinued"""

  private val prodHist = s"""
  prod_hist AS (
    SELECT ${prodCols("p_name")}, $T1 AS src_ts, 'I' AS src_op FROM part
    UNION ALL
    SELECT ${prodCols("p_name || ' v2'")}, $T2, 'I' FROM part WHERE p_partkey % 10 = 3
    UNION ALL
    SELECT ${prodCols("p_name")}, $T2, 'D' FROM part WHERE p_partkey % 100 = 17
  )"""

  private def suppCols(name: String) = s"""
      id::int AS supplierid,
      $name AS companyname,
      'SContact ' || id AS contactname,
      'Rep' AS contacttitle,
      'SupAddr ' || id AS address,
      'SupCity ' || (id % 10) AS city,
      (id % 5)::varchar AS region,
      (20000 + id)::varchar AS postalcode,
      'SupCountry ' || (id % 7) AS country,
      '557-' || id AS phone,
      CASE WHEN id % 3 = 0 THEN NULL ELSE '558-' || id END AS fax,
      'sup' || id || '.example' AS homepage"""

  private val suppHist = s"""
  supp_range AS (SELECT unnest(generate_series(1, 100)) AS id),
  supp_hist AS (
    SELECT ${suppCols("'Supplier ' || id")}, $T1 AS src_ts, 'I' AS src_op FROM supp_range
    UNION ALL
    SELECT ${suppCols("'Supplier 5 Updated'")}, $T2, 'I' FROM supp_range WHERE id = 5
  )"""

  private val catHist = s"""
  cat_hist AS (
    SELECT id::int AS categoryid, 'Category ' || id AS categoryname,
           'Desc ' || id AS description, NULL::varchar AS picture,
           $T1 AS src_ts, 'I' AS src_op
    FROM (SELECT unnest(generate_series(1, 10)) AS id)
  )"""

  private def empCols(title: String) = s"""
      id::int AS EmployeeID,
      'Last ' || id AS LastName,
      'First ' || id AS FirstName,
      $title AS title,
      'Mx.' AS TitleOfCourtesy,
      DATE '1970-01-01' + (id * 100)::int AS BirthDate,
      'EAddr ' || id AS address,
      'ECity ' || (id % 4) AS city,
      (id % 5)::varchar AS region,
      (40000 + id)::varchar AS PostalCode,
      'ECountry ' || (id % 3) AS country,
      '559-' || id AS HomePhone,
      (100 + id)::varchar AS extension"""

  private val empHist = s"""
  emp_range AS (SELECT unnest(generate_series(1, 10)) AS id),
  emp_hist AS (
    SELECT ${empCols("'Title ' || (id % 3)")}, $T1 AS src_ts, 'I' AS src_op FROM emp_range
    UNION ALL
    SELECT ${empCols("'Senior Title'")}, $T2, 'I' FROM emp_range WHERE id = 3
  )"""

  private def shipCols(phone: String) = s"""
      id::int AS shipperid, $phone AS phone, 'Shipper ' || id AS companyname"""

  private val shipHist = s"""
  ship_hist AS (
    SELECT ${shipCols("'560-' || id")}, $T1 AS src_ts, 'I' AS src_op
    FROM (SELECT unnest(generate_series(1, 3)) AS id)
    UNION ALL
    SELECT ${shipCols("'560-22'")}, $T2, 'I'
    FROM (SELECT unnest(generate_series(2, 2)) AS id)
  )"""

  private val regHist = s"""
  reg_hist AS (
    SELECT id::int AS region_id, 'Region ' || id AS region_description,
           $T1 AS src_ts, 'I' AS src_op
    FROM (SELECT unnest(generate_series(0, 4)) AS id))"""

  private val terrHist = s"""
  terr_hist AS (
    SELECT id::varchar AS territory_id, 'Territory ' || id AS territory_description,
           (id % 5)::int AS region_id, $T1 AS src_ts, 'I' AS src_op
    FROM (SELECT unnest(generate_series(0, 19)) AS id))"""

  private val empTerrHist = s"""
  empterr_hist AS (
    SELECT id::int AS employee_id, (id - 1)::varchar AS territory_id,
           $T1 AS src_ts, 'I' AS src_op FROM emp_range
    UNION ALL
    SELECT id::int, (id + 9)::varchar, $T1, 'I' FROM emp_range)"""

  // ----------------------------------------------------- staging layers

  private val stgCustomersH = s"""
  stg_customers_h AS (
    SELECT customerid AS customer_id, companyname AS company_name,
           contactname AS contact_name, contacttitle AS contact_title,
           address, city, region, postalcode AS postal_code, country, phone, fax,
           src_ts AS dl, src_op AS op,
           ${hash("customerid", "companyname", "contactname", "contacttitle",
             "address", "city", "region", "contacttitle", "country")} AS row_hash
    FROM cust_hist)"""

  private val stgOrdersH = s"""
  stg_orders_h AS (
    SELECT orderid AS order_id, customerid AS customer_id, employeeid AS employee_id,
           orderdate AS order_date, requireddate AS required_date,
           shippeddate AS shipped_date, shipvia AS shipper_id, freight,
           shipname, shipaddress AS ship_address, shipcity AS ship_city,
           shipregion AS ship_region, shippostalcode AS ship_postal_code,
           shipcountry AS ship_country, src_ts AS dl, src_op AS op,
           ${hash("orderid", "orderdate", "requireddate", "shippeddate", "shipvia",
             "freight", "shipname", "shipaddress", "shipcity", "shipregion",
             "shippostalcode", "shipcountry")} AS row_hash
    FROM ord_hist)"""

  private val stgDetailsH = s"""
  stg_details_h AS (
    SELECT orderid AS order_id, productid AS product_id, unitprice AS unit_price,
           quantity, discount, src_ts AS dl, src_op AS op,
           ${hash("orderid", "productid", "unitprice", "quantity", "discount")} AS row_hash
    FROM det_hist)"""

  private val stgProductsH = s"""
  stg_products_h AS (
    SELECT productid AS product_id, productname AS product_name,
           supplierid AS supplier_id, categoryid AS category_id,
           quantityperunit AS quantity_per_unit, unitprice AS unit_price,
           unitsinstock AS units_in_stock, unitsonorder AS units_on_order,
           reorderlevel AS reorder_level, discontinued,
           src_ts AS dl, src_op AS op
    FROM prod_hist)"""

  private val stgSuppliersH = s"""
  stg_suppliers_h AS (
    SELECT supplierid AS supplier_id, companyname AS company_name,
           contactname AS contact_name, contacttitle AS contact_title,
           address, city, region, postalcode AS postal_code, country,
           phone, fax, homepage AS home_page, src_ts AS dl, src_op AS op
    FROM supp_hist)"""

  private val stgCategoriesH = s"""
  stg_categories_h AS (
    SELECT categoryid AS category_id, categoryname AS category_name,
           description, src_ts AS dl, src_op AS op
    FROM cat_hist)"""

  private val stgEmployeesH = s"""
  stg_employees_h AS (
    SELECT EmployeeID AS employee_id, LastName AS last_name, FirstName AS first_name,
           title, TitleOfCourtesy AS title_of_courtesy, BirthDate AS birth_date,
           address, city, region, PostalCode AS postal_code, country,
           HomePhone AS home_page, extension, src_ts AS dl, src_op AS op
    FROM emp_hist)"""

  private val stgShippersH = s"""
  stg_shippers_h AS (
    SELECT shipperid AS shipper_id, phone, companyname AS company_name,
           src_ts AS dl, src_op AS op,
           ${hash("shipperid", "phone", "companyname")} AS row_hash
    FROM ship_hist)"""

  // --------------------------------------- dim events (per-cycle states)

  /** Latest row per key with src_ts <= the given cycle bound. */
  private def stateAt(src: String, key: String, bound: String): String = s"""
    SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY $key ORDER BY dl DESC)
      AS __srn FROM $src WHERE dl <= $bound) WHERE __srn = 1"""

  /** customer dim events: every staged change row + the two dummies. */
  private val custEvents = s"""
  cust_dummy AS (
    SELECT k::varchar AS customer_id, f AS company_name, f AS contact_name,
           f AS contact_title, f AS address, f AS city, f AS region,
           f AS postal_code, f AS country, f AS phone, f AS fax,
           TIMESTAMP '1900-01-01' AS dl, 'I' AS op,
           ${hash("k", "f", "f", "f", "f", "f", "f", "f", "f")} AS row_hash
    FROM (VALUES (0, 'Not Found'), (-1, 'Not Applicable')) AS d(k, f)),
  cust_events AS (
    SELECT customer_id, company_name, contact_name, contact_title, address, city,
           region, postal_code, country, phone, fax, dl AS updated_at, op, row_hash
    FROM stg_customers_h
    UNION ALL
    SELECT customer_id, company_name, contact_name, contact_title, address, city,
           region, postal_code, country, phone, fax, dl, op, row_hash
    FROM cust_dummy)"""

  private val shipEvents = s"""
  ship_dummy AS (
    SELECT k::int AS shipper_id, f AS company_name, f AS phone,
           TIMESTAMP '1900-01-01' AS dl, 'I' AS op,
           ${hash("k", "f", "f")} AS row_hash
    FROM (VALUES (0, 'Not Found'), (-1, 'Not Applicable')) AS d(k, f)),
  ship_events AS (
    SELECT shipper_id, company_name, phone, dl AS updated_at, op, row_hash
    FROM stg_shippers_h
    UNION ALL
    SELECT shipper_id, company_name, phone, dl, op, row_hash FROM ship_dummy)"""

  /** products: per-cycle 3-way join over the cycle's current staging state,
    * model-level hash (omits unit_price — reference quirk), greatest-dl
    * change detection against the previous cycle's HWM. */
  private def prodJoined(bound: String, hwm: String): String = s"""
    SELECT p.product_id, p.product_name, p.quantity_per_unit, p.unit_price,
           p.reorder_level, p.discontinued, p.op,
           s.company_name, s.address, s.city, s.region, s.postal_code, s.country,
           c.category_name, c.description,
           greatest(p.dl, s.dl, c.dl) AS updated_at,
           ${hash("p.product_id", "p.product_name", "p.quantity_per_unit",
             "p.reorder_level", "p.discontinued", "s.company_name", "s.address",
             "s.city", "s.region", "s.postal_code", "s.country",
             "c.category_name", "c.description")} AS row_hash
    FROM (${stateAt("stg_products_h", "product_id", bound)}) p
    JOIN (SELECT * FROM (${stateAt("stg_suppliers_h", "supplier_id", bound)})
          WHERE op <> 'D') s ON p.supplier_id = s.supplier_id
    JOIN (SELECT * FROM (${stateAt("stg_categories_h", "category_id", bound)})
          WHERE op <> 'D') c ON p.category_id = c.category_id
    WHERE greatest(p.dl, s.dl, c.dl) > $hwm"""

  private val prodEvents = s"""
  prod_dummy AS (
    SELECT k AS product_id, f AS product_name, f AS quantity_per_unit,
           k::double AS unit_price, k AS reorder_level, TRUE AS discontinued,
           f AS company_name, f AS address, f AS city, f AS region,
           f AS postal_code, f AS country, f AS category_name, f AS description,
           'I' AS op, TIMESTAMP '1900-01-01' AS updated_at,
           ${hash("k", "f", "f", "k::double", "k", "TRUE", "f", "f", "f", "f",
             "f", "f", "f", "f")} AS row_hash
    FROM (VALUES (0, 'Not Found'), (-1, 'Not Applicable')) AS d(k, f)),
  prod_events AS (
    SELECT product_id, product_name, quantity_per_unit, unit_price, reorder_level,
           discontinued, company_name, address, city, region, postal_code, country,
           category_name, description, updated_at, op, row_hash
    FROM (${prodJoined(T1, "TIMESTAMP '1900-01-01'")})
    UNION ALL
    SELECT product_id, product_name, quantity_per_unit, unit_price, reorder_level,
           discontinued, company_name, address, city, region, postal_code, country,
           category_name, description, updated_at, op, row_hash
    FROM (${prodJoined(T2, T1)})
    UNION ALL
    SELECT product_id, product_name, quantity_per_unit, unit_price, reorder_level,
           discontinued, company_name, address, city, region, postal_code, country,
           category_name, description, updated_at, op, row_hash
    FROM prod_dummy)"""

  /** employee: per-cycle 4-way chain (effective-inner, B9), one surviving
    * territory row per employee via (max_dl DESC, territory_description). */
  private def empJoined(bound: String, hwm: String): String = s"""
    SELECT * FROM (
      SELECT e.employee_id, e.first_name, e.last_name, e.title, e.title_of_courtesy,
             e.birth_date AS birthdate, e.address, e.city, e.region,
             e.postal_code, e.country, e.home_page, e.extension, e.op,
             r.region_description, t.territory_description,
             greatest(e.dl, et.dl, t.dl, r.dl) AS updated_at,
             ${hash("e.employee_id", "e.first_name", "e.last_name", "e.title",
               "e.title_of_courtesy", "e.birth_date", "e.address", "e.city",
               "e.region", "e.postal_code", "e.country", "e.home_page",
               "e.extension", "r.region_description", "t.territory_description")}
               AS row_hash,
             row_number() OVER (PARTITION BY e.employee_id
               ORDER BY greatest(e.dl, et.dl, t.dl, r.dl) DESC,
                        t.territory_description) AS ranked
      FROM (${stateAt("stg_employees_h", "employee_id", bound)}) e
      JOIN (SELECT * FROM (${stateAt(
                "(SELECT *, src_ts AS dl FROM empterr_hist)",
                "employee_id || '|' || territory_id", bound)})
            WHERE src_op <> 'D') et ON et.employee_id = e.employee_id
      JOIN (SELECT * FROM (${stateAt(
                "(SELECT *, src_ts AS dl FROM terr_hist)", "territory_id", bound)})
            WHERE src_op <> 'D') t ON t.territory_id = et.territory_id
      JOIN (SELECT * FROM (${stateAt(
                "(SELECT *, src_ts AS dl FROM reg_hist)", "region_id", bound)})
            WHERE src_op <> 'D') r ON r.region_id = t.region_id)
    WHERE ranked = 1 AND updated_at > $hwm"""

  private val empEvents = s"""
  emp_dummy AS (
    SELECT k AS employee_id, f AS first_name, f AS last_name, f AS title,
           f AS title_of_courtesy, DATE '1900-01-01' AS birthdate, f AS address,
           f AS city, f AS postal_code, f AS country, f AS home_page,
           f AS extension, 'I' AS op, f AS region_description,
           f AS territory_description, TIMESTAMP '1900-01-01' AS updated_at,
           ${hash("k", "f", "f", "f", "f", "DATE '1900-01-01'", "f", "f", "f",
             "f", "f", "f", "f", "f", "f")} AS row_hash
    FROM (VALUES (0, 'Not Found'), (-1, 'Not Applicable')) AS d(k, f)),
  emp_events AS (
    SELECT employee_id, first_name, last_name, title, title_of_courtesy, birthdate,
           address, city, postal_code, country, home_page, extension,
           region_description, territory_description, updated_at, op, row_hash
    FROM (${empJoined(T1, "TIMESTAMP '1900-01-01'")})
    UNION ALL
    SELECT employee_id, first_name, last_name, title, title_of_courtesy, birthdate,
           address, city, postal_code, country, home_page, extension,
           region_description, territory_description, updated_at, op, row_hash
    FROM (${empJoined(T2, T1)})
    UNION ALL
    SELECT employee_id, first_name, last_name, title, title_of_courtesy, birthdate,
           address, city, postal_code, country, home_page, extension,
           region_description, territory_description, updated_at, op, row_hash
    FROM emp_dummy)"""

  // ------------------------------------------------------- SCD2 windows

  /** Generic SCD2 finalization over an events CTE (mirrors Scd2.fromHistory:
    * no-op suppression with the op-flip check, version numbers, D/Y/N flags,
    * 1900-forced first version, interval chain, temporal SK). */
  private def scd2(events: String, key: String, payload: Seq[String],
      skName: String, out: String): String = {
    val pay = payload.mkString(", ")
    s"""
  ${out}_dedup AS (
    SELECT * FROM (
      SELECT *, lag(row_hash) OVER w AS __ph, lag(op) OVER w AS __pop
      FROM $events WINDOW w AS (PARTITION BY $key ORDER BY updated_at))
    WHERE __ph IS NULL OR __ph <> row_hash OR op <> coalesce(__pop, 'I')),
  ${out}_v AS (
    SELECT *, row_number() OVER w AS version_no, lead(updated_at) OVER w AS __next
    FROM ${out}_dedup WINDOW w AS (PARTITION BY $key ORDER BY updated_at)),
  ${out}_f AS (
    SELECT $key, $pay, row_hash, version_no::int AS version_no,
           CASE WHEN op = 'D' THEN 'D' WHEN __next IS NULL THEN 'Y' ELSE 'N'
             END AS is_active,
           CASE WHEN version_no = 1 THEN TIMESTAMP '1900-01-01' ELSE updated_at
             END AS effective_date,
           coalesce(__next, TIMESTAMP '3001-01-01') AS expiry_date
    FROM ${out}_v),
  $out AS (
    SELECT ${sk(Seq(key), "effective_date")} AS $skName, *
    FROM ${out}_f)"""
  }

  /** All shared CTEs: histories → staging → events → four dims. */
  private val dimsCte: String = "WITH " + Seq(
    custHist, ordHist, detHist, prodHist, suppHist, catHist, empHist, shipHist,
    regHist, terrHist, empTerrHist,
    stgCustomersH, stgOrdersH, stgDetailsH, stgProductsH, stgSuppliersH,
    stgCategoriesH, stgEmployeesH, stgShippersH,
    custEvents, shipEvents, prodEvents, empEvents,
    scd2("cust_events", "customer_id",
      Seq("company_name", "contact_name", "contact_title", "address", "city",
        "region", "postal_code", "country", "phone", "fax", "updated_at"),
      "customer_sk", "dim_customer"),
    scd2("ship_events", "shipper_id", Seq("company_name", "phone", "updated_at"),
      "shipper_sk", "dim_shipper"),
    scd2("prod_events", "product_id",
      Seq("product_name", "quantity_per_unit", "unit_price", "reorder_level",
        "discontinued", "company_name", "address", "city", "region",
        "postal_code", "country", "category_name", "description", "updated_at"),
      "product_sk", "dim_products"),
    scd2("emp_events", "employee_id",
      Seq("first_name", "last_name", "title", "title_of_courtesy", "birthdate",
        "address", "city", "postal_code", "country", "home_page", "extension",
        "region_description", "territory_description", "updated_at"),
      "employee_sk", "dim_employee")
  ).mkString(",\n")

  // ------------------------------------------------------------ queries

  /** q36: final fact_order after two cycles — latest change row per order,
    * SKs as-of order_date against the final dims (≡ per-cycle lookups plus
    * the repair pass, see NorthwindWarehouse scaladoc), created/updated from
    * first/last touch (repair bumps rows of late-arriving customers). */
  val factOrder: String = dimsCte + s""",
  fo_latest AS (
    SELECT * FROM (
      SELECT *, row_number() OVER (PARTITION BY order_id ORDER BY dl DESC) AS __rn,
             min(dl) OVER (PARTITION BY order_id) AS first_dl
      FROM stg_orders_h) WHERE __rn = 1),
  resolved AS (
    SELECT f.*,
           coalesce(de.employee_sk, $DummySk) AS employee_sk,
           coalesce(dc.customer_sk, $DummySk) AS customer_sk,
           coalesce(ds.shipper_sk, $DummySk) AS shipper_sk
    FROM fo_latest f
    LEFT JOIN dim_employee de ON de.employee_id = f.employee_id
      AND f.order_date::timestamp >= de.effective_date
      AND f.order_date::timestamp < de.expiry_date
    LEFT JOIN dim_customer dc ON dc.customer_id = f.customer_id
      AND f.order_date::timestamp >= dc.effective_date
      AND f.order_date::timestamp < dc.expiry_date
    LEFT JOIN dim_shipper ds ON ds.shipper_id = f.shipper_id
      AND f.order_date::timestamp >= ds.effective_date
      AND f.order_date::timestamp < ds.expiry_date)
  SELECT order_id, customer_id, employee_id, shipper_id,
         employee_sk, customer_sk, shipper_sk,
         epoch_us(order_date::timestamp) AS order_us,
         epoch_us(required_date::timestamp) AS required_us,
         epoch_us(shipped_date::timestamp) AS shipped_us,
         freight, shipname, ship_address, ship_city, ship_region,
         ship_postal_code, ship_country, op AS record_status, row_hash,
         epoch_us(dl) AS dl_us,
         epoch_us(first_dl) AS created_us,
         epoch_us(CASE WHEN dl = $T2 THEN dl
                       WHEN (customer_id::bigint - 1) % 7 = 2 THEN $T2
                       ELSE dl END) AS updated_us
  FROM resolved"""

  /** q39: final dim_products state. */
  val dimProducts: String = dimsCte + s"""
  SELECT product_sk, product_id, product_name, quantity_per_unit, unit_price,
         reorder_level, discontinued, company_name, address, city, region,
         postal_code, country, category_name, description, row_hash, version_no,
         is_active, epoch_us(updated_at) AS updated_us,
         epoch_us(effective_date) AS effective_us, epoch_us(expiry_date) AS expiry_us
  FROM dim_products"""

  /** q41: final dim_employee state. */
  val dimEmployee: String = dimsCte + s"""
  SELECT employee_sk, employee_id, first_name, last_name, title, title_of_courtesy,
         birthdate, address, city, postal_code, country, home_page, extension,
         region_description, territory_description, row_hash, version_no, is_active,
         epoch_us(updated_at) AS updated_us,
         epoch_us(effective_date) AS effective_us, epoch_us(expiry_date) AS expiry_us
  FROM dim_employee"""

  /** q93: final dim_customer state. */
  val dimCustomer: String = dimsCte + s"""
  SELECT customer_sk, customer_id, company_name, contact_name, contact_title,
         address, city, region, postal_code, country, phone, fax, row_hash,
         version_no, is_active, epoch_us(updated_at) AS updated_us,
         epoch_us(effective_date) AS effective_us, epoch_us(expiry_date) AS expiry_us
  FROM dim_customer"""

  /** q94: final dim_shipper state. */
  val dimShipper: String = dimsCte + s"""
  SELECT shipper_sk, shipper_id, company_name, phone, row_hash, version_no,
         is_active, epoch_us(updated_at) AS updated_us,
         epoch_us(effective_date) AS effective_us, epoch_us(expiry_date) AS expiry_us
  FROM dim_shipper"""

  /** q92 helper: the snapshot's 4-way current-state join at one cycle bound —
    * snapshot conventions: no HWM filter, no dummies, no op filters, raw
    * `region` kept (snapshots/snapshot_employee.sql:57-135). */
  private def snapJoined(bound: String): String = s"""
    SELECT * FROM (
      SELECT e.employee_id, e.first_name, e.last_name, e.title, e.title_of_courtesy,
             e.birth_date AS birthdate, e.address, e.city, e.region,
             e.postal_code, e.country, e.home_page, e.extension,
             r.region_description, t.territory_description,
             greatest(e.dl, et.dl, t.dl, r.dl) AS updated_at,
             ${hash("e.employee_id", "e.first_name", "e.last_name", "e.title",
               "e.title_of_courtesy", "e.birth_date", "e.address", "e.city",
               "e.region", "e.postal_code", "e.country", "e.home_page",
               "e.extension", "r.region_description", "t.territory_description")}
               AS row_hash,
             row_number() OVER (PARTITION BY e.employee_id
               ORDER BY greatest(e.dl, et.dl, t.dl, r.dl) DESC,
                        t.territory_description) AS ranked
      FROM (${stateAt("stg_employees_h", "employee_id", bound)}) e
      JOIN (${stateAt("(SELECT *, src_ts AS dl FROM empterr_hist)",
                "employee_id || '|' || territory_id", bound)}) et
        ON et.employee_id = e.employee_id
      JOIN (${stateAt("(SELECT *, src_ts AS dl FROM terr_hist)", "territory_id", bound)}) t
        ON t.territory_id = et.territory_id
      JOIN (${stateAt("(SELECT *, src_ts AS dl FROM reg_hist)", "region_id", bound)}) r
        ON r.region_id = t.region_id)
    WHERE ranked = 1"""

  private val snapCols = "employee_id, first_name, last_name, title, " +
    "title_of_courtesy, birthdate, address, city, region, postal_code, country, " +
    "home_page, extension, region_description, territory_description, row_hash, updated_at"

  /** q92: two-cycle snapshot_employee ≡ snapshot over both per-cycle states —
    * hash no-op suppression (op-less), observed valid_from (no 1900 forcing),
    * NULL-open valid_to, scd id = md5(key, epoch micros of valid_from) (B6
    * literal-string quirk fixed on both sides). */
  val snapshotEmployee: String = dimsCte + s""",
  snap_events AS (
    SELECT $snapCols FROM (${snapJoined(T1)})
    UNION ALL
    SELECT $snapCols FROM (${snapJoined(T2)})),
  snap_dedup AS (
    SELECT * FROM (
      SELECT *, lag(row_hash) OVER w AS __ph
      FROM snap_events WINDOW w AS (PARTITION BY employee_id ORDER BY updated_at))
    WHERE __ph IS NULL OR __ph <> row_hash),
  snap_v AS (
    SELECT *, lead(updated_at) OVER (PARTITION BY employee_id ORDER BY updated_at)
      AS valid_to
    FROM snap_dedup)
  SELECT ${sk(Seq("employee_id"), "updated_at")} AS employee_scd_id,
         employee_id, first_name, last_name, title, title_of_courtesy, birthdate,
         address, city, region, postal_code, country, home_page, extension,
         region_description, territory_description, row_hash,
         epoch_us(updated_at) AS valid_from_us, epoch_us(valid_to) AS valid_to_us
  FROM snap_v"""

  /** q40: final fact_order_details — latest row per (order, product), joined
    * to the product version valid at its load time. */
  val factOrderDetails: String = dimsCte + s""",
  det_latest AS (
    SELECT * FROM (
      SELECT *, row_number() OVER (PARTITION BY order_id, product_id
        ORDER BY dl DESC) AS __rn
      FROM stg_details_h) WHERE __rn = 1)
  SELECT d.order_id, d.product_id, d.unit_price, d.quantity, d.discount,
         epoch_us(d.dl) AS updated_us, d.op, d.row_hash,
         dp.product_sk, dp.product_name, dp.quantity_per_unit, dp.reorder_level,
         dp.discontinued, dp.company_name, dp.address, dp.city, dp.region,
         dp.postal_code, dp.country, dp.category_name, dp.description,
         dp.version_no, epoch_us(dp.effective_date) AS effective_us
  FROM det_latest d
  LEFT JOIN dim_products dp ON dp.product_id = d.product_id
    AND d.dl >= dp.effective_date AND d.dl < dp.expiry_date"""
}
