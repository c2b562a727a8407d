package graft.northwind

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions._

/** The reference's 11 staging models, bound column-for-column
  * (/root/reference/models/staging/ *.sql): snake_case rename projection,
  * date casts, and the CDC envelope — `dl_process_date` (here the source
  * row's batch timestamp `src_ts`, the deterministic stand-in for
  * `current_timestamp()`), `op` from the loader, and `row_hash` over the
  * model's EXACT tracked-column list.
  *
  * Reference quirks kept for schema/semantic parity (SURVEY §2.10):
  *  - B4: stg_customers hashes contact_title twice and omits
  *    postal_code/phone/fax (stg_customers.sql:20-29) — phone-only changes
  *    stay invisible to SCD2, as in the reference;
  *  - B5: stg_employees aliases HomePhone as home_page
  *    (stg_employees.sql:17);
  *  - stg_orders' hash omits customer_id/employee_id (stg_orders.sql:22-35);
  *  - stg_employees' hash stops at extension — photo/notes/reports_to/
  *    photo_path are untracked (stg_employees.sql:24-38).
  *
  * Every model is a pure projection: no shuffle, fully codegen'd, parquet
  * scan pruned to the consumed columns.
  */
object NorthwindStaging {

  private def envelope(df: DataFrame, projection: Seq[(String, Column)],
      hashCols: Seq[String]): DataFrame =
    df.select(projection.map { case (n, c) => c.as(n) } ++
        Seq(col("src_ts").as("dl_process_date"), col("src_op").as("op")): _*)
      .withColumn("row_hash", rowHash(hashCols.map(col): _*))

  /** stg_orders (stg_orders.sql:6-35). */
  def stgOrders(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "order_id" -> col("orderid"),
      "customer_id" -> col("customerid"),
      "employee_id" -> col("employeeid"),
      "order_date" -> col("orderdate").cast("date"),
      "required_date" -> col("requireddate").cast("date"),
      "shipped_date" -> col("shippeddate").cast("date"),
      "shipper_id" -> col("shipvia"),
      "freight" -> col("freight"),
      "shipname" -> col("shipname"),
      "ship_address" -> col("shipaddress"),
      "ship_city" -> col("shipcity"),
      "ship_region" -> col("shipregion"),
      "ship_postal_code" -> col("shippostalcode"),
      "ship_country" -> col("shipcountry")),
    Seq("order_id", "order_date", "required_date", "shipped_date", "shipper_id",
      "freight", "shipname", "ship_address", "ship_city", "ship_region",
      "ship_postal_code", "ship_country"))

  /** stg_order_details (stg_order_details.sql:6-20). */
  def stgOrderDetails(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "order_id" -> col("orderid"),
      "product_id" -> col("productid"),
      "unit_price" -> col("unitprice"),
      "quantity" -> col("quantity"),
      "discount" -> col("discount")),
    Seq("order_id", "product_id", "unit_price", "quantity", "discount"))

  /** stg_customers (stg_customers.sql:6-30; B4 hash list kept verbatim). */
  def stgCustomers(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "customer_id" -> col("customerid"),
      "company_name" -> col("companyname"),
      "contact_name" -> col("contactname"),
      "contact_title" -> col("contacttitle"),
      "address" -> col("address"),
      "city" -> col("city"),
      "region" -> col("region"),
      "postal_code" -> col("postalcode"),
      "country" -> col("country"),
      "phone" -> col("phone"),
      "fax" -> col("fax")),
    Seq("customer_id", "company_name", "contact_name", "contact_title",
      "address", "city", "region", "contact_title", "country"))

  /** stg_products (stg_products.sql:6-30). */
  def stgProducts(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "product_id" -> col("productid"),
      "product_name" -> col("productname"),
      "supplier_id" -> col("supplierid"),
      "category_id" -> col("categoryid"),
      "quantity_per_unit" -> col("quantityperunit"),
      "unit_price" -> col("unitprice"),
      "units_in_stock" -> col("unitsinstock"),
      "units_on_order" -> col("unitsonorder"),
      "reorder_level" -> col("reorderlevel"),
      "discontinued" -> col("discontinued")),
    Seq("product_id", "product_name", "supplier_id", "category_id",
      "quantity_per_unit", "unit_price", "units_in_stock", "units_on_order",
      "reorder_level", "discontinued"))

  /** stg_employees (stg_employees.sql:6-40; B5 home_page alias kept). */
  def stgEmployees(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "employee_id" -> col("EmployeeID"),
      "last_name" -> col("LastName"),
      "first_name" -> col("FirstName"),
      "title" -> col("title"),
      "title_of_courtesy" -> col("TitleOfCourtesy"),
      "birth_date" -> col("BirthDate"),
      "address" -> col("address"),
      "city" -> col("city"),
      "region" -> col("region"),
      "postal_code" -> col("PostalCode"),
      "country" -> col("country"),
      "home_page" -> col("HomePhone"),
      "extension" -> col("extension"),
      "photo" -> col("photo"),
      "notes" -> col("notes"),
      "reports_to" -> col("ReportsTo"),
      "photo_path" -> col("PhotoPath")),
    Seq("employee_id", "last_name", "first_name", "title", "title_of_courtesy",
      "birth_date", "address", "city", "region", "postal_code", "country",
      "home_page", "extension"))

  /** stg_suppliers (stg_suppliers.sql:6-31). */
  def stgSuppliers(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "supplier_id" -> col("supplierid"),
      "company_name" -> col("companyname"),
      "contact_name" -> col("contactname"),
      "contact_title" -> col("contacttitle"),
      "address" -> col("address"),
      "city" -> col("city"),
      "region" -> col("region"),
      "postal_code" -> col("postalcode"),
      "country" -> col("country"),
      "phone" -> col("phone"),
      "fax" -> col("fax"),
      "home_page" -> col("homepage")),
    Seq("supplier_id", "company_name", "contact_name", "contact_title",
      "address", "city", "region", "postal_code", "country"))

  /** stg_categories (stg_categories.sql:6-18). */
  def stgCategories(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "category_id" -> col("categoryid"),
      "category_name" -> col("categoryname"),
      "description" -> col("description"),
      "picture" -> col("picture")),
    Seq("category_id", "category_name", "description"))

  /** stg_shippers (stg_shippers.sql:6-16). */
  def stgShippers(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "shipper_id" -> col("shipperid"),
      "phone" -> col("phone"),
      "company_name" -> col("companyname")),
    Seq("shipper_id", "phone", "company_name"))

  /** stg_region (stg_region.sql:6-13). */
  def stgRegion(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "region_id" -> col("RegionID"),
      "region_description" -> col("RegionDescription")),
    Seq("region_id", "region_description"))

  /** stg_territories (stg_territories.sql:6-13). */
  def stgTerritories(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "territory_id" -> col("TerritoryID"),
      "territory_description" -> col("TerritoryDescription"),
      "region_id" -> col("RegionID")),
    Seq("territory_id", "territory_description", "region_id"))

  /** stg_employeeterritories (stg_employeeterritories.sql:6-12). */
  def stgEmployeeTerritories(src: DataFrame): DataFrame = envelope(src,
    Seq(
      "employee_id" -> col("EmployeeID"),
      "territory_id" -> col("TerritoryID")),
    Seq("employee_id", "territory_id"))
}
