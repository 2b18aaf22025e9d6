"""Exact rule-comment literals from the reference (SURVEY.md §2.8).

Every string is byte-identical to the cited line of
SL_SPK_Cleansing.py (CL) / SL_SPK_Check_V1.py (V1) /
Status_Cleansing.py (SC) — golden tests compare against these.
"""

# Cascade A — main sheet (CL:119-134, 286-303)
A0B_SWISSCO = "Ok,buy from 9000341 (Swissco),FIN review in Year end"  # CL:120-121
A1_DUAL = "MDO action, check dual sources"  # CL:128
A2_CANCELLED = "MDO action,SKU cancelled in Plant,why SL still exist?"  # CL:131
A3_APEX_SENTINEL = (
    "Cty Buy via Apex, check sheet 'SKU via Apex SPK' for more details"
)  # CL:134
A4_INTRA_SENTINEL = (
    "CN,JP Intra-company SL, check sheet 'CN_JP_Intra' for more details"
)  # CL:286
A5_MATCH = "Ok, SPK match SL"  # CL:294
A6_TW = "Ok, FIN will conduct yearly check for TW"  # CL:299
A7_MISMATCH = "MDO action, SPK mismatch SL"  # CL:303

# Cascade B — Apex sheet (CL:165-202)
B1 = "Ok, Buy via Apex via Temse or 3rd party"  # CL:169
B2 = "MDO action, Apex buy from Non-ECC vendor but country SPK is not 5S"  # CL:175
B3 = (
    "MDO action,check with planner if still required to buy via Apex "
    "as Apex already cancelled this SKU"
)  # CL:181
B4 = "MDO action,check with Apex MDO Apex SL missing but MG5=300"  # CL:186
B5 = "Ok, Cty SPK match with Apex MG5"  # CL:191
B6 = "MDO action,check with Apex MDO as SKU not extended under 3000/20"  # CL:195
B7 = "MDO action,check with Apex MDO as 3000/20 MG5 not in scope"  # CL:199
B8 = (
    "MDO action,Cty SPK mistmatch with Apex MG5, pls check with Apex MDO on "
    "what is the actual source or if it exists in exceptional table"
)  # CL:202

# Cascade C — IntraCo sheet (CL:234-245)
C1 = "Ok, InterCo Sub Plant SPK match Main Plant SPK"  # CL:236
C2 = (
    "MDO action, InterCo Main Plant obsolete,but Sub plant still active,"
    "can discon in Sub Plant?"
)  # CL:241
C3 = "MDO action, InterCo Sub plant and Main plant SPK mismatch"  # CL:245

# Cascade D — status sheet (SC:112-161)
D1 = "Ok,raw materials out of scope"  # SC:112
D2 = "Ok,local plant status match with X-plant status"  # SC:116
D3 = "MDO action, check with planner why X-plant 80 but have inventory"  # SC:122
D4 = "MDO action, check with planner why local plant 80 but have inventory"  # SC:128
D5 = "Ok, SKU cancelled locally and no inventory"  # SC:134
D6 = (
    "MDO action, check with planner why Enterprise inactive but local still active"
)  # SC:140
D7 = (
    "MDO action, check with planner if could cancel the SKU in plant "
    "as no existing inventory"
)  # SC:146
D8 = "Ok, Status 70 awaiting existing inventory clearance"  # SC:152
D9 = "Ok, Clinical trial"  # SC:157
D10 = (
    "MDO action, check with planner as misalignment in X-plant and "
    "local plant status"
)  # SC:161

# V1 deltas (V1:118, 247, 270)
A3_APEX_SENTINEL_V1 = "Cty Buy via Apex"  # V1:118
A4_INTRA_SENTINEL_V1 = "CN,JP Intra-company SL"  # V1:247
B8_V1 = (
    "MDO action,Cty SPK mistmatch with Apex MG5, pls check with Apex MDO on "
    "what is the actual source"
)  # V1:175
